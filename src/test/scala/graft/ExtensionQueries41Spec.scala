package graft

import graft.queries.ExtensionQueries41

/** Property pins for the round-9 twenty-ninth batch (cross-engine
  * equality is the DuckDB oracle's job — these assert operator
  * SEMANTICS: completeness accounting on planted holes, lift vs base
  * rate, flag thresholds on planted bursts).
  */
class ExtensionQueries41Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  private val dayNs = 86400000000000L

  private def eventsDir(prefix: String,
      rows: Seq[(Long, Long, String, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    rows.map { case (id, u, t, ts) => (id, u, t, ts, 1.0, "{}") }
      .toDF("event_id", "user_id", "event_type", "ts", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  // ------------------------------------------ q216 backfill monitor

  test("q216: a planted hole is counted and its first missing day reported") {
    // calendar = days 0,1,2 (from type A); type B missing day 1
    val rows = Seq(
      (1L, 1L, "A", 0 * dayNs), (2L, 1L, "A", 1 * dayNs),
      (3L, 1L, "A", 2 * dayNs),
      (4L, 2L, "B", 0 * dayNs), (5L, 2L, "B", 2 * dayNs))
    val out = ExtensionQueries41
      .q216_backfill_monitor(spark, eventsDir("q216", rows)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)), r.getLong(5)))).toMap
    assert(out("A") == ((3L, 3L, 0L, None, 1000000L)))
    assert(out("B") == ((3L, 2L, 1L, Some(1L), 666666L)))
  }

  test("q216: complete types on real data report zero missing") {
    val out = ExtensionQueries41.q216_backfill_monitor(spark, sfTiny).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3))
      assert((r.getLong(3) == 0L) == (r.get(4) == null))
    }
  }

  // ------------------------------------ q217 page conversion lift

  test("q217: a page only in converting sessions lifts above 1e6; accounting holds") {
    val m = 60000000000L
    import spark.implicits._
    // 10 users, one session each; users 0-4 convert. Page 7 appears only
    // in converting sessions; page 8 in all sessions.
    val rows = (0L until 10L).flatMap { u =>
      val base = Seq(
        (u * 100 + 1, u, "view", s"""{"k": 8}""", 0 * m),
        (u * 100 + 2, u, "view", s"""{"k": ${if (u < 5) 7 else 9}}""", 1 * m))
      val conv = if (u < 5) Seq((u * 100 + 3, u, "purchase", "{}", 2 * m))
        else Seq.empty
      base ++ conv
    }.map { case (id, u, t, props, ts) => (id, u, t, ts, 1.0, props) }
    val dir = java.nio.file.Files.createTempDirectory("q217").toString
    rows.toDF("event_id", "user_id", "event_type", "ts", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = ExtensionQueries41.q217_page_conversion_lift(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    // base rate = 5/10 = 500000 ppm
    assert(out(7L) == ((5L, 5L, 1000000L, 2000000L))) // 2x lift
    assert(out(8L) == ((10L, 5L, 500000L, 1000000L))) // exactly base
    assert(out(9L) == ((5L, 0L, 0L, 0L)))
  }

  // ------------------------------------------ q218 abuse heuristics

  test("q218: planted burst user flags; calm user does not") {
    val m = 60000000000L
    // burst user 1: 12 events 1ms apart; calm user 2: 3 events 1h apart
    val rows = (1L to 12L).map(k => (k, 1L, "click", k * 1000000L)) ++
      Seq((21L, 2L, "view", 0L), (22L, 2L, "view", 60 * m),
        (23L, 2L, "view", 120 * m))
    val out = ExtensionQueries41
      .q218_abuse_heuristics(spark, eventsDir("q218", rows)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3),
        r.getBoolean(5), r.getBoolean(6)))).toMap
    // user 1: min gap 1ms -> burst; 12 events vs mean 7.5 -> not >3x (22.5)
    assert(out(1L) == ((12L, 1000L, true, false)))
    assert(out(2L) == ((3L, 3600000000L, false, false)))
  }

  test("q218: median gap is the exact middle order statistic (hand case)") {
    // gaps 10ms, 20ms, 30ms, 40ms -> median element ceil(4+1)/2=2 -> 20ms
    val rows = Seq((1L, 1L, "a", 0L), (2L, 1L, "a", 10000000L),
      (3L, 1L, "a", 30000000L), (4L, 1L, "a", 60000000L),
      (5L, 1L, "a", 100000000L))
    val out = ExtensionQueries41
      .q218_abuse_heuristics(spark, eventsDir("q218b", rows)).collect()
    assert(out.length == 1)
    assert(out(0).getLong(4) == 20000L) // 20ms in µs
  }
}
