package graft

import graft.queries.ExtensionQueries45

/** Property pins for the round-9 thirty-third batch (cross-engine
  * equality is the DuckDB oracle's job — these assert operator
  * SEMANTICS: separation on engineered clusters, confusion-matrix
  * accounting vs q159, kappa extremes).
  */
class ExtensionQueries45Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  // ------------------------------------------ q228 separation

  test("q228: tight far-apart clusters separate; intra is zero for identical members") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q228").toString
    // label 0: four identical vectors (intra = 0 -> div guard: intra>0?
    // identical members give intra_micro 0 -> ratio div-by-zero... use
    // NEAR-identical: one component differs by 1 quantum at 2^-20)
    val e = 1.0f / 1048576f
    val rows = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(1.0f + e * 2, 0.0f), 0),
      (3L, Array(0.0f, 1.0f), 1), (4L, Array(0.0f, 1.0f + e * 2), 1))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = ExtensionQueries45.q228_label_separation(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.keySet == Set(0L, 1L))
    out.values.foreach { case (intra, inter, ratio) =>
      assert(intra > 0 && inter > intra)
      assert(ratio > 1000000L) // well-separated
    }
  }

  test("q228: real labels report positive finite separation") {
    val out = ExtensionQueries45.q228_label_separation(spark, sfTiny)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
      assert(r.getLong(3) == r.getLong(2) * 1000000L / r.getLong(1))
    }
  }

  // ------------------------------------------ q229 confusion

  test("q229: matrix marginals reconcile with q159's per-class accuracy") {
    val conf = ExtensionQueries45.q229_knn_confusion(spark, sfTiny).collect()
    val acc = graft.queries.ExtensionQueries21
      .q159_knn_accuracy(spark, sfTiny).collect()
      .map(r => r.getInt(0).toLong -> ((r.getLong(1), r.getLong(2)))).toMap
    val byTrue = conf.groupBy(_.getLong(0))
    byTrue.foreach { case (t, rows) =>
      val (nProbes, nCorrect) = acc(t)
      assert(rows.map(_.getLong(2)).sum == nProbes, s"row sum for $t")
      val diag = rows.filter(r => r.getLong(1) == t).map(_.getLong(2)).sum
      assert(diag == nCorrect, s"diagonal for $t")
    }
    // total mass = probe count
    assert(conf.map(_.getLong(2)).sum == acc.values.map(_._1).sum)
  }

  // ------------------------------------------ q230 kappa

  test("q230: identical raters give kappa exactly 1e6; opposite raters negative") {
    import spark.implicits._
    def dirFor(prefix: String, docs: Seq[(Long, String, Long)]): String = {
      val dir = java.nio.file.Files.createTempDirectory(prefix).toString
      docs.map { case (id, text, n) => (id, text, "en", "s", n) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    // identical: short docs are exactly the repetitive ones
    // repetitive text: "a a a a" (2 distinct of 4 -> 2*2 !< 4 is false...
    // need distinct*2 < total: 1 distinct of 4: "a a a a")
    val rep = "a a a a"           // 1 distinct, 4 tokens -> flagged
    val div = "w x y z"           // 4 distinct -> not flagged
    val same = dirFor("q230a", Seq(
      (1L, rep, 100L), (2L, rep, 150L),     // short AND repetitive
      (3L, div, 300L), (4L, div, 400L)))    // long AND diverse
    val r1 = ExtensionQueries45.q230_cohens_kappa(spark, same).collect()(0)
    assert(r1.getLong(1) == 4L && r1.getLong(4) == 1000000L)

    // opposite: short docs are exactly the diverse ones
    val opp = dirFor("q230b", Seq(
      (1L, div, 100L), (2L, div, 150L),
      (3L, rep, 300L), (4L, rep, 400L)))
    val r2 = ExtensionQueries45.q230_cohens_kappa(spark, opp).collect()(0)
    assert(r2.getLong(1) == 0L && r2.getLong(4) == -1000000L)
  }
}
