package graft

import graft.queries.ExtensionQueries56

/** Property pins for the round-9 forty-fourth batch (cross-engine
  * equality is the DuckDB oracle's job — these assert operator
  * SEMANTICS: duplicate-run counting, template thresholds, rank-change
  * arithmetic on engineered flips).
  */
class ExtensionQueries56Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  // ------------------------------------------ q261 duplicate actions

  test("q261: a pure-repeat user scores 1e6; an alternating user scores 0") {
    import spark.implicits._
    val rows =
      (1 to 25).map(i => (i.toLong, 1L, "click", i * 1000000000L, 1.0,
        """{"k": 5}""")) ++
      (1 to 25).map(i => (100L + i, 2L,
        if (i % 2 == 0) "view" else "click", i * 1000000000L, 1.0,
        s"""{"k": ${i % 2}}"""))
    val dir = java.nio.file.Files.createTempDirectory("q261").toString
    rows.toDF("event_id", "user_id", "event_type", "ts", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = ExtensionQueries56.q261_duplicate_actions(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == ((25L, 24L, 1000000L)))
    assert(out(2L) == ((25L, 0L, 0L)))
  }

  // ------------------------------------------ q262 templates

  test("q262: planted template prefix found with exact share; unique openings drop") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q262").toString
    val template = "terms of service apply here"
    val rows = (1 to 4).map(i =>
      (i.toLong, s"$template extra $i", if (i <= 2) "s1" else "s2")) ++
      (5 to 10).map(i => (i.toLong, s"unique opening number $i text", "s3"))
    rows.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = ExtensionQueries56.q262_template_prefixes(spark, dir).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getString(0) == template)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((4L, 2L, 400000L)))
  }

  // ------------------------------------------ q263 rank movers

  test("q263: an engineered revenue flip produces opposite rank changes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q263").toString
    def ts(day: Int) = new java.sql.Timestamp(day * 86400000L)
    // half split at mid-day 50: part 1 dominates half A, part 2 half B;
    // part 3 stable in both
    val orders = Seq((1L, ts(0)), (2L, ts(100)))
    orders.map { case (k, d) => (k, k, "O", 1.0, d, "x") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val lines = Seq(
      (1L, 1L, 100.0), (1L, 2L, 10.0), (1L, 3L, 50.0),   // half A
      (2L, 1L, 10.0), (2L, 2L, 100.0), (2L, 3L, 50.0))   // half B
    lines.zipWithIndex.map { case ((o, p, price), i) =>
      (o, p, p, i, 1.0, price, 0.0, 0.0, "N", "O", ts(0)) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = ExtensionQueries56.q263_rank_movers(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // half A ranks: p1=1, p3=2, p2=3; half B: p2=1, p3=2, p1=3
    assert(out(1L) == ((1L, 3L, -2L)))
    assert(out(2L) == ((3L, 1L, 2L)))
    assert(out(3L) == ((2L, 2L, 0L)))
  }

  test("q263: real-data rank changes are antisymmetric in aggregate") {
    val out = ExtensionQueries56.q263_rank_movers(spark, sfTiny).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(3) == r.getLong(1) - r.getLong(2))
      assert(r.getLong(4) == math.abs(r.getLong(3)))
    }
  }
}
