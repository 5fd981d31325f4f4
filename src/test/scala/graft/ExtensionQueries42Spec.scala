package graft

import graft.queries.ExtensionQueries42

/** Property pins for the round-9 thirtieth batch (cross-engine equality
  * is the DuckDB oracle's job — these assert operator SEMANTICS:
  * baseline-normalized lift, same-dollar NDR forwarding, pair dedup and
  * window bounds).
  */
class ExtensionQueries42Spec extends SparkSpecBase {

  private def eventsDir(prefix: String,
      rows: Seq[(Long, Long, String, Long, Double, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    rows.toDF("event_id", "user_id", "event_type", "ts", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val hourNs = 3600000000000L

  // ----------------------------------------------- q219 trending

  test("q219: flat page lifts exactly 1e6; bursting page above; new page -1") {
    // page 1: 1 view per hour for 25h (flat: hour=1, base=24 -> lift 1e6)
    // page 2: 24 views in the last hour only, none before -> -1 (new)
    // page 3: 1 view in each of hours 2..25 but 6 in the last hour
    val rows =
      (0 until 25).map(h => (100L + h, 1L, "view", h * hourNs + 1000L, 1.0,
        """{"k": 1}""")) ++
      (0 until 24).map(i => (200L + i, 2L, "view", 24 * hourNs + i * 1000000L + 2000L, 1.0,
        """{"k": 2}""")) ++
      (0 until 24).map(h => (300L + h, 3L, "view", h * hourNs + 3000L, 1.0,
        """{"k": 3}""")) ++
      (0 until 5).map(i => (400L + i, 3L, "view", 24 * hourNs + i * 1000000L + 4000L, 1.0,
        """{"k": 3}"""))
    val out = ExtensionQueries42
      .q219_trending_pages(spark, eventsDir("q219", rows.map(identity)))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // anchor = max ts. page 1: last-hour 1 (hour 24 event), base 24
    assert(out(1L)._3 == 1000000L)
    assert(out(2L) == ((24L, 0L, -1L)))
    // page 3: hour 6 (5 burst + the h=24 base... h=24 is within last hour)
    // events hours 0..23 are base (24), burst 5 in last hour + none else
    assert(out(3L)._1 == 6L || out(3L)._1 == 5L) // anchor ties depend on max
    assert(out(3L)._3 > 1000000L)
  }

  // ----------------------------------------------- q220 NDR

  test("q220: expansion, churn, and new users are accounted correctly") {
    val monthNs = 30L * 86400000000000L
    // m0: u1 $100, u2 $50. m1: u1 $150 (expansion), u2 nothing (churn),
    // u3 $999 (new - NOT in NDR base for m1)
    val rows = Seq(
      (1L, 1L, "purchase", 1000L, 100.0, "{}"),
      (2L, 2L, "purchase", 2000L, 50.0, "{}"),
      (3L, 1L, "purchase", monthNs + 1000L, 150.0, "{}"),
      (4L, 3L, "purchase", monthNs + 2000L, 999.0, "{}"))
    val out = ExtensionQueries42
      .q220_net_revenue_retention(spark, eventsDir("q220", rows)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    // month 1: base = u1+u2 = 15000c; retained = u1's 15000c... u1 spends
    // 15000c in m1; NDR = 15000/15000 = 1e6
    assert(out(1L) == ((2L, 15000L, 15000L, 1000000L)))
    // month 2 row: base = m1 purchasers (u1 15000c + u3 99900c), retained 0
    assert(out(2L) == ((2L, 114900L, 0L, 0L)))
  }

  // ----------------------------------------------- q221 duplicates

  test("q221: same-dollar pair within 24h found once; outside window or amount dropped") {
    val rows = Seq(
      // pair: u1 $20.00 and $20.99 (same dollar bucket 20) 1h apart
      (1L, 1L, "purchase", 0L, 20.00, "{}"),
      (2L, 1L, "purchase", hourNs, 20.99, "{}"),
      // not a pair: 25h apart
      (3L, 2L, "purchase", 0L, 30.0, "{}"),
      (4L, 2L, "purchase", 25 * hourNs, 30.0, "{}"),
      // not a pair: different dollars
      (5L, 3L, "purchase", 0L, 40.0, "{}"),
      (6L, 3L, "purchase", 1000L, 41.0, "{}"))
    val out = ExtensionQueries42
      .q221_duplicate_payments(spark, eventsDir("q221", rows)).collect()
    assert(out.length == 1)
    val r = out(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((1L, 20L, 1L, 2L, 3600000000L)))
  }
}
