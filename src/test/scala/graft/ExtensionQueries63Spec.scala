package graft

import graft.queries.ExtensionQueries63

/** Property pins for the round-10 native-TIMESTAMP window batch
  * (cross-engine equality is the DuckDB oracle's job — these assert the
  * WINDOW SEMANTICS the mirrors must reproduce: epoch alignment, the
  * strict session-gap boundary, the 2-way sliding fan-out).
  */
class ExtensionQueries63Spec extends SparkSpecBase {

  import org.apache.spark.sql.functions._

  private def writeEvents(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("eq63").toString
    rows.map { case (id, tsNanos, uid, et, v) =>
      (id, tsNanos, uid, et, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val HourNs = 3600L * 1000000000L
  private val MinNs = 60L * 1000000000L

  test("q282: tumbling windows are epoch-hour-aligned; cents sum exact") {
    val dir = writeEvents(Seq(
      (1L, 10L * MinNs, 1L, "view", 1.25), // hour 0
      (2L, 59L * MinNs, 2L, "view", 2.50), // hour 0
      (3L, 60L * MinNs, 1L, "view", 0.75), // hour 1 boundary: new window
      (4L, 61L * MinNs, 1L, "buy", 1.00))) // hour 1, other type
    val r = ExtensionQueries63.q282_tumbling_native_ts(spark, dir)
      .select(unix_timestamp(col("window_start")).as("start_s"),
        col("event_type"), col("n"), col("n_users"), col("sum_cents"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2),
        x.getLong(3), x.getLong(4))).toSeq
    assert(r == Seq((0L, "view", 2L, 2L, 375L),
      (3600L, "buy", 1L, 1L, 100L), (3600L, "view", 1L, 1L, 75L)))
  }

  test("q283: a gap of EXACTLY 30 min still merges; 30 min + 1 ns splits") {
    val dir = writeEvents(Seq(
      (1L, 0L, 1L, "view", 1.00),
      (2L, 30L * MinNs, 1L, "view", 1.00),     // exactly 30 min: MERGES
      (3L, 60L * MinNs + 1000L, 1L, "view", 1.00), // 30 min + 1 µs: NEW
      (4L, 0L, 2L, "view", 5.00)))
    val r = ExtensionQueries63.q283_session_native_ts(spark, dir)
      .select(col("user_id"), unix_timestamp(col("session_start")).as("ss"),
        unix_timestamp(col("session_end")).as("se"), col("n_events"),
        col("sum_cents"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4))).toSeq
    // session 1: events at 0 and 30min (boundary merge), end = 30+30 min;
    // session 2: the 60min+1µs event alone (unix_timestamp floors the µs)
    assert(r == Seq(
      (1L, 0L, 3600L, 2L, 200L),
      (1L, 3600L, 5400L, 1L, 100L),
      (2L, 0L, 1800L, 1L, 500L)))
  }

  test("q284: every event lands in exactly two overlapping windows") {
    val dir = writeEvents(Seq((1L, 45L * MinNs, 1L, "view", 1.0)))
    val r = ExtensionQueries63.q284_sliding_native_ts(spark, dir)
      .select(unix_timestamp(col("window_start")).as("ss"),
        unix_timestamp(col("window_end")).as("se"), col("n"), col("n_users"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3))).toSeq
    // event at 00:45 → windows [00:00, 01:00) and [00:30, 01:30)
    assert(r == Seq((0L, 3600L, 1L, 1L), (1800L, 5400L, 1L, 1L)))
  }

  test("q282/q284 window shapes pass the fleet plan gate and stay aggregate-only") {
    val sf = "/root/testdata/sf0.001"
    Seq("q282_tumbling_native_ts", "q283_session_native_ts",
      "q284_sliding_native_ts").foreach { n =>
      val df = SparkEntry.queries(n)(spark, sf)
      assert(graft.plans.PlanGate.audit(n, df).isEmpty, s"$n trips PlanGate")
      val p = df.queryExecution.optimizedPlan.toString
      assert(!p.contains("Join"), s"$n should be scan→window→agg, no join:\n$p")
    }
  }
}
