package graft

import org.apache.spark.sql.functions._
import graft.queries.ExtensionQueries32

/** Property pins for the round-9 twentieth batch (cross-engine equality
  * is the DuckDB oracle's job — these assert operator SEMANTICS: the
  * IVM delta algebra term by term, bitmap merge boundaries, dwell
  * censoring).
  */
class ExtensionQueries32Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  // ------------------------------------------------ q190 IVM

  test("q190: delta refresh with all four terms contributing equals the naive join") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q190").toString
    val oldDay = new java.sql.Timestamp(9000L * 86400000L) // < 1995
    val newDay = new java.sql.Timestamp(9200L * 86400000L) // >= 1995
    // customers: 1, 11 old (x%10 != 0); 10, 20 new; nations 0 and 1
    Seq((1L, 0), (11L, 1), (10L, 0), (20L, 1))
      .map { case (k, n) => (k, s"c$k", n, 0.0, "SEG") }
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // orders exercising old⋈old, new⋈old, old⋈new, new⋈new
    Seq((1L, 1L, oldDay, 10.0),   // old order, old cust (stored state)
      (2L, 1L, newDay, 20.0),     // new order, old cust (ΔA ⋈ B_old)
      (3L, 10L, oldDay, 40.0),    // old order, new cust (A_old ⋈ ΔB)
      (4L, 20L, newDay, 80.0),    // new order, new cust (ΔA ⋈ ΔB)
      (5L, 11L, oldDay, 1.0))
      .map { case (ok, ck, d, p) => (ok, ck, "O", p, d, "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = ExtensionQueries32.q190_ivm_join(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // nation 0: orders 1,2,3 -> 3 orders, 7000 cents
    // nation 1: orders 4,5  -> 2 orders, 8100 cents
    assert(out == Map(0L -> ((3L, 7000L)), 1L -> ((2L, 8100L))))
  }

  test("q190: refresh equals the naive full join on real data") {
    val got = ExtensionQueries32.q190_ivm_join(spark, sfTiny).collect()
      .map(_.toString)
    val naive = graft.core.Tables.orders(spark, sfTiny)
      .join(graft.core.Tables.customer(spark, sfTiny),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").cast("long").as("nation"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .orderBy(col("nation"))
      .collect().map(_.toString)
    assert(got.nonEmpty && got.sameElements(naive))
  }

  // ------------------------------------------------ q191 bitmaps

  test("q191: rollup equals COUNT(DISTINCT) per week on real data") {
    val got = ExtensionQueries32.q191_bitmap_rollup(spark, sfTiny).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expect = graft.core.Tables.events(spark, sfTiny)
      .select(col("event_type"),
        expr("ts div 1000 div 86400000000 div 7").as("week"), col("user_id"))
      .groupBy("event_type", "week")
      .agg(countDistinct("user_id").as("d"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty && got == expect)
  }

  test("q191: users active on two days of one week count once; week boundary splits") {
    import spark.implicits._
    val day = 86400000000000L // ns
    val rows = Seq(
      (1L, 63L, "a", 0 * day),      // week 0, day 0
      (2L, 63L, "a", 6 * day),      // week 0, day 6 -> same user, counts once
      (3L, 64L, "a", 6 * day),      // week 0 (word boundary vs user 63)
      (4L, 63L, "a", 7 * day))      // week 1 -> counted again there
      .map { case (id, u, t, ts) => (id, u, t, ts, 1.0, "{}") }
    val dir = java.nio.file.Files.createTempDirectory("q191").toString
    rows.toDF("event_id", "user_id", "event_type", "ts", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = ExtensionQueries32.q191_bitmap_rollup(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(("a", 0L) -> 2L, ("a", 1L) -> 1L))
  }

  // ------------------------------------------------ q192 dwell

  test("q192: dwell is exact time-to-next-event; session last event is censored") {
    import spark.implicits._
    val m = 60000000000L
    val rows = Seq(
      // session 1: page 5 (10 min), page 7 (10 min), page 9 censored
      (1L, 1L, 5L, 0 * m), (2L, 1L, 7L, 10 * m), (3L, 1L, 9L, 20 * m),
      // session 2 (60-min gap): page 5 again, censored (no next event)
      (4L, 1L, 5L, 80 * m))
      .map { case (id, u, page, ts) =>
        (id, u, "view", ts, 1.0, s"""{"k": $page}""") }
    val dir = java.nio.file.Files.createTempDirectory("q192").toString
    rows.toDF("event_id", "user_id", "event_type", "ts", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = ExtensionQueries32.q192_dwell_time(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val tenMinUs = 600000000L
    assert(out == Map(5L -> ((1L, tenMinUs, tenMinUs)),
      7L -> ((1L, tenMinUs, tenMinUs))))
  }

  test("q192: an event with a null page still ends the previous page's dwell") {
    import spark.implicits._
    val m = 60000000000L
    val rows = Seq(
      (1L, 1L, """{"k": 5}""", 0 * m), (2L, 1L, "{}", 5 * m),
      (3L, 1L, """{"k": 7}""", 9 * m))
      .map { case (id, u, props, ts) => (id, u, "view", ts, 1.0, props) }
    val dir = java.nio.file.Files.createTempDirectory("q192b").toString
    rows.toDF("event_id", "user_id", "event_type", "ts", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = ExtensionQueries32.q192_dwell_time(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // page 5 dwells 5 min (to the null-page event); page 7 censored
    assert(out == Map(5L -> 300000000L))
  }
}
