package graft

import org.apache.spark.sql.functions._
import graft.queries.ExtensionQueries21

/** Property pins for the round-9 ninth batch (cross-engine equality is
  * the DuckDB oracle's job — these assert operator SEMANTICS: vote
  * tie-breaks, exact rank selection, band-nesting containment).
  */
class ExtensionQueries21Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  // ------------------------------------------------- q159 kNN accuracy

  test("q159: hand vectors — majority vote, tie breaks to the SMALLEST label") {
    import spark.implicits._
    // probe 0 (true label 5) and five near neighbors whose labels tie
    // 2-vs-2 between classes 2 and 7 (plus one vote for 1): pred must be 2
    val rows = Seq(
      (0L, Array(1.0f, 0.0f), 5),
      (100L, Array(1.0f, 0.01f), 2), (101L, Array(1.0f, 0.02f), 2),
      (102L, Array(1.0f, 0.03f), 7), (103L, Array(1.0f, 0.04f), 7),
      (104L, Array(1.0f, 0.05f), 1),
      (105L, Array(0.0f, 1.0f), 9)) // far — never in the top-5
    val dir = java.nio.file.Files.createTempDirectory("q159").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = ExtensionQueries21.q159_knn_accuracy(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getInt(0) == 5 && r.getLong(1) == 1L && r.getLong(2) == 0L &&
      r.getLong(3) == 0L,
      s"tie 2-vs-7 resolves to 2, which mismatches true label 5: $r")
  }

  test("q159: per-class counts partition the probe set; accuracy is the exact ratio") {
    val out = ExtensionQueries21.q159_knn_accuracy(spark, sfTiny).collect()
    val probes = graft.core.Tables.embeddings(spark, sfTiny)
      .filter(col("vec_id") < 50).count()
    assert(out.map(_.getLong(1)).sum == probes)
    out.foreach { r =>
      val (n, c, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(c <= n && ppm == c * 1000000L / n, s"exact ppm identity: $r")
    }
  }

  // ----------------------------------------------- q160 inter-arrival

  test("q160: hand gaps — exact ceil-rank selection of p50/p90") {
    import spark.implicits._
    // events at 0 / 10ms / 30ms / 100ms → gaps 10 000, 20 000, 70 000 µs;
    // n=3, p50 = ceil(1.5)=2nd smallest = 20 000, p90 = ceil(2.7)=3rd = 70 000
    val rows = Seq((1L, 0L), (2L, 10000L), (3L, 30000L), (4L, 100000L))
      .map { case (id, us) => (id, "m", us * 1000L, 1L) }
    val dir = java.nio.file.Files.createTempDirectory("q160").toString
    rows.toDF("event_id", "event_type", "ts", "user_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = ExtensionQueries21.q160_interarrival(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "m" && r.getLong(1) == 3L &&
      r.getLong(2) == 20000L && r.getLong(3) == 70000L, s"$r")
  }

  // ------------------------------------------------- q161 LSH sweep

  test("q161: band nesting — candidates are CONTAINED up the geometry ladder") {
    // an (8,8) band is two concatenated (16,4) bands: equality on 8
    // components implies equality on both 4-runs, so cand(8,8) ⊆
    // cand(16,4), and likewise cand(4,16) ⊆ cand(8,8). The sweep's
    // counts must therefore be monotone in the band count.
    val out = ExtensionQueries21.q161_lsh_sweep(spark, sfTiny)
      .orderBy(col("bands").desc).collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(16, 8, 4))
    val cands = out.map(_.getAs[Long]("n_cand"))
    val hits = out.map(_.getAs[Long]("n_hit"))
    val recalls = out.map(_.getAs[Long]("recall_ppm"))
    assert(cands(0) >= cands(1) && cands(1) >= cands(2), cands.mkString(","))
    assert(hits(0) >= hits(1) && hits(1) >= hits(2), hits.mkString(","))
    assert(recalls(0) >= recalls(1) && recalls(1) >= recalls(2))
    out.foreach { r =>
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_cand"))
      assert(r.getAs[Long]("precision_ppm") <= 1000000L)
    }
  }

  test("q161: the subset relation holds pair-for-pair, not just in counts") {
    import graft.ext.Dedup
    val toks = graft.ext.TextAnalysis.tokens(col("text"))
    val d = graft.core.Tables.documents(spark, sfTiny)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), col("text")).filter(size(toks) >= 8)
    val doctored = d.select((col("doc_id") + 100000).as("doc_id"),
      concat_ws(" ", slice(toks, lit(1), greatest(size(toks) - 5, lit(3)))).as("text"))
    val all = d.union(doctored)
      .withColumn("hashes", Dedup.shingleHashes(col("text"), 3))
      .select(col("doc_id"), Dedup.minhashFromHashes(col("hashes"), 64).as("sig"))
      .localCheckpoint()
    def pairs(b: Int) = Dedup.lshCandidates(all, "doc_id", col("sig"), b)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (c16, c8, c4) = (pairs(16), pairs(8), pairs(4))
    assert(c4.subsetOf(c8) && c8.subsetOf(c16),
      s"|c4|=${c4.size} |c8|=${c8.size} |c16|=${c16.size}")
  }
}
