package graft

import graft.queries.ExtensionQueries57

/** Property pins for the round-9 forty-fifth batch (cross-engine
  * equality is the DuckDB oracle's job — these assert operator
  * SEMANTICS: reconciliation buckets on balanced vs broken books,
  * session-index attribution, emergence extremes).
  */
class ExtensionQueries57Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  // ---------------------------------------- q264 reconciliation

  test("q264: balanced books land in bucket 0; a planted 2% drift in bucket 2") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q264").toString
    def ts = new java.sql.Timestamp(0L)
    // order 1: header == lines (bucket 0); order 2: header 2% high
    // (bucket 2); order 3: header 0.5% high (bucket 1)
    Seq((1L, 100.00), (2L, 102.00), (3L, 100.50))
      .map { case (k, tot) => (k, k, "O", tot, ts, "x") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 60.0), (1L, 40.0), (2L, 100.0), (3L, 100.0))
      .zipWithIndex.map { case ((k, p), i) =>
        (k, i.toLong, i.toLong, i, 1.0, p, 0.0, 0.0, "N", "O", ts) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = ExtensionQueries57.q264_ledger_reconciliation(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out(0L) == ((1L, 0L)))
    assert(out(1L) == ((1L, 50L)))
    assert(out(2L) == ((1L, 200L)))
  }

  // ---------------------------------------- q265 session index

  test("q265: conversion attributes to the right session ordinal") {
    import spark.implicits._
    val m = 60000000000L
    // user 1: session 1 no purchase, session 2 purchase
    // user 2: session 1 purchase only
    val rows = Seq(
      (1L, 1L, "view", 0 * m), (2L, 1L, "click", 1 * m),
      (3L, 1L, "view", 60 * m), (4L, 1L, "purchase", 61 * m),
      (5L, 2L, "purchase", 0 * m))
      .map { case (id, u, t, ts) => (id, u, t, ts, 1.0) }
    val dir = java.nio.file.Files.createTempDirectory("q265").toString
    rows.toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = ExtensionQueries57.q265_first_session_effect(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(out(1L) == ((2L, 1L, 500000L))) // first sessions: u1 no, u2 yes
    assert(out(2L) == ((1L, 1L, 1000000L))) // u1's second session converts
  }

  test("q265: session totals reconcile with q21 on real data") {
    val out = ExtensionQueries57.q265_first_session_effect(spark, sfTiny)
      .collect()
    val nSessions = graft.queries.RelationalQueries2
      .q21_sessionize(spark, sfTiny).count()
    assert(out.map(_.getLong(1)).sum == nSessions)
  }

  // ---------------------------------------- q266 emergence

  test("q266: an engineered late-half token tops the leaderboard at 1e6") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q266").toString
    // docs 1..100; 'late' appears 20x only in docs > 50; 'always' everywhere
    val rows = (1 to 100).map { i =>
      val t = if (i > 80) "always late" else "always stable"
      (i.toLong, t, "en", "s", t.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = ExtensionQueries57.q266_new_vocabulary(spark, dir).collect()
    assert(out.nonEmpty)
    val top = out.head
    assert(top.getString(0) == "late")
    assert((top.getLong(1), top.getLong(2), top.getLong(3))
      == ((0L, 20L, 1000000L)))
    // 'always' is stationary at 50%
    val always = out.find(_.getString(0) == "always").get
    assert(always.getLong(3) == 500000L)
  }
}
