package graft

import org.apache.spark.sql.functions._
import graft.queries.ExtensionQueries14

/** q133–q136: cohort retention, rolling DAU/WAU, table profiler,
  * feature-store user profiles — planted-data semantics checks.
  */
class ExtensionQueries14Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  /** Write a hand-built events table (LONG-nanos ts) to a temp sf dir. */
  private def eventsDir(rows: Seq[(Long, Long, Long, String, Double, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ev14").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val DayNs = 86400000000000L
  // 2024-01-01 (a Monday) 00:00 UTC in nanos
  private val Mon1 = 1704067200000000000L

  test("q133: two planted cohorts retain as planted") {
    // cohort A (users 1,2) first active week 1; user 1 returns week 2.
    // cohort B (user 3) first active week 2 only.
    val dir = eventsDir(Seq(
      (1L, Mon1, 1L, "view", 0.0, "{}"),
      (2L, Mon1 + DayNs, 2L, "view", 0.0, "{}"),
      (3L, Mon1 + 7 * DayNs, 1L, "view", 0.0, "{}"),
      (4L, Mon1 + 8 * DayNs, 3L, "view", 0.0, "{}")))
    val rows = ExtensionQueries14.q133_cohort_retention(spark, dir).collect()
      .map(r => (r.getAs[Int]("cohort_week"), r.getAs[Int]("week_offset")) ->
        (r.getAs[Long]("n_active"), r.getAs[Long]("cohort_size"), r.getAs[Long]("retention_ppm")))
      .toMap
    val wkA = (Mon1 / DayNs).toInt // Monday's epoch day
    assert(rows((wkA, 0)) == ((2L, 2L, 1000000L)))
    assert(rows((wkA, 1)) == ((1L, 2L, 500000L))) // user 1 retained
    assert(rows((wkA + 7, 0)) == ((1L, 1L, 1000000L))) // cohort B
    assert(rows.size == 3)
  }

  test("q134: trailing-7-day WAU counts a user once per window") {
    // user 1 active days 0 and 2 (counted once in overlapping windows);
    // user 2 active day 8 only.
    val dir = eventsDir(Seq(
      (1L, 1000L, 1L, "view", 0.0, "{}"),
      (2L, 2 * DayNs, 1L, "view", 0.0, "{}"),
      (3L, 2 * DayNs + 5L, 1L, "view", 0.0, "{}"),
      (4L, 8 * DayNs, 2L, "view", 0.0, "{}")))
    val rows = ExtensionQueries14.q134_rolling_active(spark, dir).collect()
      .map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("n_dau"), r.getAs[Long]("n_wau7"), r.getAs[Long]("stickiness_ppm")))
      .toMap
    // only days with same-day activity appear
    assert(rows.keySet == Set(0L, 2L, 8L))
    assert(rows(0L) == ((1L, 1L, 1000000L)))
    assert(rows(2L) == ((1L, 1L, 1000000L))) // user 1 deduped in window [−4..2]
    assert(rows(8L) == ((1L, 2L, 500000L))) // window [2..8] sees users 1 and 2
  }

  test("q135: profiler reports nulls, exact ndv, padded min/max in one scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_prof").toString
    Seq(
      (3L, 1L, 1L, 1, 5.0, 0.0, 0.0, 0.0, "A", "F", "2020-01-02 00:00:00"),
      (10L, 2L, 1L, 2, 5.0, 0.0, 0.0, 0.0, null.asInstanceOf[String], "F", "2019-06-01 00:00:00"),
      (2L, 3L, 2L, 1, 7.0, 0.0, 0.0, 0.0, "R", "O", "2020-01-02 00:00:00"))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "sd")
      .withColumn("l_shipdate", col("sd").cast("timestamp")).drop("sd")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = ExtensionQueries14.q135_table_profile(spark, dir).collect()
      .map(r => r.getAs[String]("col_name") ->
        (r.getAs[Long]("n_nonnull"), r.getAs[Long]("n_null"), r.getAs[Long]("ndv"),
          r.getAs[String]("min_v"), r.getAs[String]("max_v")))
      .toMap
    assert(rows.size == ExtensionQueries14.ProfileCols.size)
    // zero-padding makes lexicographic min/max numeric: 2 < 3 < 10
    assert(rows("l_orderkey") == ((3L, 0L, 3L, "0" * 19 + "2", "0" * 18 + "10")))
    assert(rows("l_returnflag") == ((2L, 1L, 2L, "A", "R")))
    assert(rows("l_quantity")._3 == 2L) // ndv {5, 7}
    assert(rows("l_shipdate") == ((3L, 0L, 2L, "2019-06-01", "2020-01-02")))
  }

  test("q136: survivorship picks the latest value per type, ties by event_id") {
    // user 1: purchases at t=100 ($2.00) and t=200 ($1.00) → latest $1.00;
    // two errors at the SAME ts, event_id 11 then 12 → props of 12 wins.
    // user 2: no purchases/errors → null latest fields, zero sums.
    val dir = eventsDir(Seq(
      (10L, 100L, 1L, "purchase", 2.00, "{}"),
      (11L, 300L, 1L, "error", 0.0, "{\"e\":1}"),
      (12L, 300L, 1L, "error", 0.0, "{\"e\":2}"),
      (13L, 200L, 1L, "purchase", 1.00, "{}"),
      (14L, 50L, 1L, "signup", 0.0, "{}"),
      (15L, 400L, 2L, "view", 3.0, "{}")))
    val rows = ExtensionQueries14.q136_user_profile(spark, dir).collect()
    val u1 = rows.find(_.getAs[Long]("user_id") == 1L).get
    assert(u1.getAs[Long]("n_events") == 5L)
    assert(u1.getAs[Long]("n_purchases") == 2L)
    assert(u1.getAs[Long]("purchase_cents") == 300L)
    assert(u1.getAs[Long]("last_purchase_cents") == 100L) // t=200 wins
    assert(u1.getAs[String]("last_error_props") == "{\"e\":2}") // event_id tie-break
    assert(u1.getAs[Long]("first_signup_ts") == 50L)
    val u2 = rows.find(_.getAs[Long]("user_id") == 2L).get
    assert(u2.getAs[Long]("n_purchases") == 0L && u2.getAs[Long]("purchase_cents") == 0L)
    assert(u2.isNullAt(u2.fieldIndex("last_purchase_cents")))
    assert(u2.isNullAt(u2.fieldIndex("first_signup_ts")))
  }

  test("q133/q134 run green on the real sf0.001 events") {
    assert(ExtensionQueries14.q133_cohort_retention(spark, sfTiny).count() > 0)
    val daily = ExtensionQueries14.q134_rolling_active(spark, sfTiny).collect()
    assert(daily.nonEmpty)
    // WAU is always ≥ DAU, so stickiness ≤ 1
    assert(daily.forall(r => r.getAs[Long]("n_wau7") >= r.getAs[Long]("n_dau")))
    assert(daily.forall(r => r.getAs[Long]("stickiness_ppm") <= 1000000L))
  }
}
