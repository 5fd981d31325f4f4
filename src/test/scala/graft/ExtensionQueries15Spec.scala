package graft

import org.apache.spark.sql.functions._
import graft.queries.ExtensionQueries15

/** q137–q140: bucketed co-located join, exact stratified split, event
  * trigrams, seasonal MAD anomalies.
  */
class ExtensionQueries15Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  test("q137: bucketed layout joins with ZERO exchange into the join") {
    // broadcast disabled so the join must satisfy its distribution
    // requirement from the bucketed layout alone
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = ExtensionQueries15.q137_bucketed_join(spark, sfTiny)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // exchanges allowed ONLY above the join (final agg + orderBy);
      // the join inputs must come straight off the bucketed scans
      val joinInput = plan.split("SortMergeJoin").last
      assert(!joinInput.contains("Exchange"),
        s"join inputs must be exchange-free (bucketed):\n$plan")
      assert(df.collect().nonEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("q137: result is layout-independent (equals the plain join)") {
    val bucketed = ExtensionQueries15.q137_bucketed_join(spark, sfTiny).collect()
    val o = graft.core.Tables.orders(spark, sfTiny)
    val c = graft.core.Tables.customer(spark, sfTiny)
    val plain = o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        count_distinct(col("c_custkey")).as("n_customers"),
        (sum(round(col("o_totalprice") * 100).cast("long")) / 100.0).as("revenue"))
      .orderBy(col("c_mktsegment")).collect()
    assert(bucketed.map(_.toString).toSeq == plain.map(_.toString).toSeq)
  }

  test("q138: every stratum splits to exactly floor(0.8 n) train rows") {
    val rows = ExtensionQueries15.q138_stratified_split(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, tr, te) = (r.getAs[Long]("n_total"), r.getAs[Long]("n_train"),
        r.getAs[Long]("n_test"))
      assert(tr == n * 4 / 5, s"${r.getAs[String]("lang")}: $tr != floor(0.8*$n)")
      assert(tr + te == n)
      assert(r.getAs[Boolean]("split_exact"))
    }
  }

  test("q138: the split is deterministic across invocations") {
    val a = ExtensionQueries15.q138_stratified_split(spark, sfTiny).collect()
    val b = ExtensionQueries15.q138_stratified_split(spark, sfTiny).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq) // checksum pins membership
  }

  test("q139: planted session yields its sliding trigrams in order") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tri").toString
    // user 1: A B C D → ABC, BCD; user 2: A B C → ABC
    Seq(
      (1L, 100L, 1L, "A", 0.0, "{}"), (2L, 200L, 1L, "B", 0.0, "{}"),
      (3L, 300L, 1L, "C", 0.0, "{}"), (4L, 400L, 1L, "D", 0.0, "{}"),
      (5L, 100L, 2L, "A", 0.0, "{}"), (6L, 200L, 2L, "B", 0.0, "{}"),
      (7L, 300L, 2L, "C", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = ExtensionQueries15.q139_event_trigrams(spark, dir).collect()
      .map(r => (r.getAs[String]("e1"), r.getAs[String]("e2"), r.getAs[String]("e3"),
        r.getAs[Long]("n_occurrences"))).toSeq
    assert(got == Seq(("A", "B", "C", 2L), ("B", "C", "D", 1L)))
  }

  test("q140: a planted traffic spike is flagged, steady cells are not") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_seas").toString
    val DayNs = 86400000000000L
    val HourNs = 3600000000000L
    // 4 Mondays (2024-01-01 epoch-aligned + k*7 days), hour 10: three
    // weeks have 2 events, one week has 20 (the incident)
    val Mon1 = 1704067200000000000L
    val steady = for {
      wk <- 0 until 4; i <- 0 until (if (wk == 2) 20 else 2)
    } yield (wk * 100L + i, Mon1 + wk * 7 * DayNs + 10 * HourNs + i * 1000L,
      1L, "view", 0.0, "{}")
    steady.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = ExtensionQueries15.q140_seasonal_anomaly(spark, dir).collect()
    assert(rows.length == 4) // one (day, hour) cell per week
    val flagged = rows.filter(_.getAs[Boolean]("is_anomaly"))
    assert(flagged.length == 1 && flagged.head.getAs[Long]("n") == 20L)
    // baseline: median of {2,2,20,2} = 2, MAD = 0 → spike adev 18 > 0
    assert(flagged.head.getAs[Double]("med_n") == 2.0)
  }

  test("q140: real-corpus run — deviation flags are consistent with the bands") {
    val rows = ExtensionQueries15.q140_seasonal_anomaly(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expect = math.abs(r.getAs[Long]("n") - r.getAs[Double]("med_n")) >
        r.getAs[Double]("mad_n") * 3.0
      assert(r.getAs[Boolean]("is_anomaly") == expect)
    }
  }
}
