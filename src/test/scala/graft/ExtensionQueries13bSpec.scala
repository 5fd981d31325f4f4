package graft

import org.apache.spark.sql.functions._
import graft.queries.ExtensionQueries13

/** q131 (snapshot token drift) and q132 (SQ8 scalar quantization). */
class ExtensionQueries13bSpec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  test("q131: drift rows respect the noise floor and ppm arithmetic") {
    val rows = ExtensionQueries13.q131_token_drift(spark, sfTiny).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    assert(rows.forall(r =>
      r.getAs[Long]("cnt_a") + r.getAs[Long]("cnt_b") >= ExtensionQueries13.DriftMinCount))
    assert(rows.forall(r =>
      r.getAs[Long]("drift_ppm") ==
        math.abs(r.getAs[Long]("ppm_a") - r.getAs[Long]("ppm_b"))))
    // ranking is by descending drift
    val drifts = rows.map(_.getAs[Long]("drift_ppm")).toSeq
    assert(drifts == drifts.sorted.reverse)
  }

  test("q131: a planted one-sided token burst ranks first") {
    // snap = doc_id % 2: even doc_ids are snapshot A, odd are B. Equal
    // totals (140 tokens each): 'stable' 100x in both (drift 0), 'burst'
    // 40x only in A, 'zz_newcomer' 40x only in B (both drift ~285714 ppm;
    // the tok tiebreak puts 'burst' first).
    import spark.implicits._
    val ten = (t: String) => Seq.fill(10)(t).mkString(" ")
    val docs = (
      (0 until 4).map(i => (100L + i * 2, ten("burst"))) ++
      (0 until 10).map(i => (i * 2L, ten("stable"))) ++
      (0 until 10).map(i => (i * 2 + 1L, ten("stable"))) ++
      (0 until 4).map(i => (101L + i * 2, ten("zz_newcomer")))
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_drift").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val top = ExtensionQueries13.q131_token_drift(spark, dir).collect()
    assert(top.head.getAs[String]("tok") == "burst")
    assert(top.head.getAs[Long]("cnt_b") == 0L)
    val stable = top.find(_.getAs[String]("tok") == "stable")
    assert(stable.forall(r => r.getAs[Long]("drift_ppm") < top.head.getAs[Long]("drift_ppm")))
  }

  test("q132: codes are int8-bounded and reconstruction is certified on the corpus") {
    val rows = ExtensionQueries13.q132_scalar_quantize(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("code_min") >= 0L &&
      r.getAs[Long]("code_max") <= 255L))
    assert(rows.forall(_.getAs[Boolean]("reconstruction_certified")),
      "every dimension must reconstruct within step/2")
    val dims = rows.map(_.getAs[Long]("n_dims")).distinct
    assert(dims.length == 1, s"corpus embeddings must share one dim, got $dims")
  }

  test("q132: hand vectors — extremes code to 0/255, constant dims code to 0") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(0.0f, 5.0f, 7.0f)),
      (2L, Array(1.0f, 5.0f, -3.0f)),
      (3L, Array(0.5f, 5.0f, 2.0f))).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_sq").toString
    vecs.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = ExtensionQueries13.q132_scalar_quantize(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("code_min"), r.getAs[Long]("code_max"),
          r.getAs[Boolean]("reconstruction_certified"))).toMap
    // dim1 range [0,1]: v1→0, v2→255, v3→round(.5/step)=128. dim2 constant → code 0.
    // dim3 range [-3,7]: v1→255, v2→0, v3→round(5/step)=128 (step=10/255).
    assert(got(1L) == ((0L, 255L, true)))
    assert(got(2L) == ((0L, 255L, true)))
    assert(got(3L) == ((0L, 128L, true)))
  }
}
