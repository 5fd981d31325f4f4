package graft

import graft.queries.ExtensionQueries59

/** Property pins for the round-9 forty-seventh batch (cross-engine
  * equality is the DuckDB oracle's job — these assert operator
  * SEMANTICS: pigeonhole collisions, provenance accounting, trim
  * boundaries).
  */
class ExtensionQueries59Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  // ---------------------------------------- q270 hash collisions

  test("q270: accounting identities hold; the 7-bit space collides by pigeonhole") {
    val r = ExtensionQueries59
      .q270_hashkey_collisions(spark, sfTiny).collect()(0)
    val (rows, keys, ck, cr, worst) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    assert(rows >= keys)
    assert(cr == rows - (keys - ck)) // colliding rows = rows minus singletons
    assert(worst >= (if (ck > 0) 2L else 1L))
    // 150+ names in 128 buckets: pigeonhole forces collisions
    assert(ck > 0 && keys <= 128L)
    assert(r.getLong(5) == cr * 1000000L / rows)
  }

  // ---------------------------------------- q271 provenance

  test("q271: every cluster's member count is consistent with its base count") {
    val out = ExtensionQueries59.q271_cross_source_dups(spark, sfTiny)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (members, bases, sources) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // each base contributes up to 3 corpus members (original + 2 variants)
      assert(members <= bases * 3)
      assert(sources <= bases)
      assert(r.getString(4).split(",").length == sources)
    }
    // total members across clusters = corpus size that got clustered
    val lblCount = graft.queries.ExtensionQueries2
      .q42_dedup_clusters(spark, sfTiny).count()
    assert(out.map(_.getLong(1)).sum == lblCount)
  }

  // ---------------------------------------- q272 trimmed mean

  test("q272: planted outlier moves the raw mean but not the trimmed one") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q272").toString
    // 20 balances of $10 plus one $100000 whale in segment A
    val rows = (1 to 20).map(i => (i.toLong, 10.0)) :+ ((21L, 100000.0))
    rows.map { case (k, b) => (k, s"c$k", 0, b, "A") }
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val r = ExtensionQueries59.q272_trimmed_mean(spark, dir).collect()(0)
    // n=21, trim 2 from each end: kept ranks 3..19 -> all $10 rows
    assert(r.getLong(1) == 21L)
    assert(r.getLong(3) == 1000L) // trimmed mean exactly $10
    assert(r.getLong(2) > r.getLong(3)) // whale inflates the raw mean
    assert(r.getLong(4) == r.getLong(2) - r.getLong(3))
  }
}
