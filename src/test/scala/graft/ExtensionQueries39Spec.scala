package graft

import graft.queries.ExtensionQueries39

/** Property pins for the round-9 twenty-seventh batch (cross-engine
  * equality is the DuckDB oracle's job — these assert operator
  * SEMANTICS: sweep-vs-hand concurrency, threshold monotonicity, FD
  * verdicts on known keys).
  */
class ExtensionQueries39Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  private def eventsDir(prefix: String,
      rows: Seq[(Long, Long, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    rows.map { case (id, u, ts) => (id, u, "view", ts, 1.0) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  // --------------------------------------------- q210 concurrency

  test("q210: hand intervals — overlap peaks, back-to-back never double-counts") {
    val m = 60000000000L // 1 min ns
    // u1: session 0-10 min; u2: session 5-12 min (overlap 5-10);
    // u3: single event at min 10 (the exact end of u1's session)
    val rows = Seq(
      (1L, 1L, 0 * m), (2L, 1L, 10 * m),
      (3L, 2L, 5 * m), (4L, 2L, 12 * m),
      (5L, 3L, 10 * m))
    val out = ExtensionQueries39
      .q210_peak_concurrency(spark, eventsDir("q210", rows)).collect()
    assert(out.length == 1 && out(0).getLong(0) == 0L)
    // at min 10: u1 still open (ends at 10+1µs... end_us+1 => closes after),
    // u2 open, u3 starts -> 3 concurrent
    assert(out(0).getLong(1) == 3L)
  }

  test("q210: disjoint sessions give peak 1") {
    val m = 60000000000L
    val rows = Seq((1L, 1L, 0 * m), (2L, 1L, 100 * m)) // two sessions, 1 user
    val out = ExtensionQueries39
      .q210_peak_concurrency(spark, eventsDir("q210b", rows)).collect()
    assert(out.forall(_.getLong(1) == 1L))
  }

  // --------------------------------------------- q211 sensitivity

  test("q211: session counts are monotone non-increasing in the gap") {
    val out = ExtensionQueries39.q211_session_sensitivity(spark, sfTiny)
      .collect().sortBy(_.getLong(0))
    assert(out.length == 3)
    val ns = out.map(_.getLong(1))
    assert(ns.reverse.sorted.sameElements(ns.reverse), ns.mkString(","))
    // 30-minute row must agree with q21's session count
    val q21n = graft.queries.RelationalQueries2
      .q21_sessionize(spark, sfTiny).count()
    assert(out(1).getLong(1) == q21n)
  }

  // --------------------------------------------- q212 FD discovery

  test("q212: known keys hold; known non-dependencies are violated") {
    val out = ExtensionQueries39.q212_fd_discovery(spark, sfTiny).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(out("o_orderkey->o_custkey")._3) // orderkey is a key
    assert(out("c_custkey->c_nationkey")._3) // custkey is a key
    // a customer places orders with many priorities
    val (_, viol, holds) = out("o_custkey->o_orderpriority")
    assert(!holds && viol > 0)
    out.values.foreach { case (keys, v, h) =>
      assert(v >= 0 && v <= keys && h == (v == 0))
    }
  }
}
