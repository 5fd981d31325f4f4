package graft

import org.apache.spark.sql.functions._
import graft.queries.ExtensionQueries25

/** Property pins for the round-9 thirteenth batch (cross-engine equality
  * is the DuckDB oracle's job — these assert operator SEMANTICS: the
  * conversion deadline, pre-signup exclusion, orphan accounting).
  */
class ExtensionQueries25Spec extends SparkSpecBase {

  // --------------------------------------- q171 conversion window

  test("q171: the 7-day deadline excludes late buyers; pre-signup purchases never count") {
    import spark.implicits._
    val day = 86400000000000L // ns
    val rows = Seq(
      // user 1: signup day 0, purchase day 3 → converts, latency 3 days
      (1L, 1L, "signup", 0L), (2L, 1L, "purchase", 3 * day),
      // user 2: signup day 0, purchase day 8 → MISSES the deadline
      (3L, 2L, "signup", 0L), (4L, 2L, "purchase", 8 * day),
      // user 3: purchase day 1 BEFORE signup day 2 → no conversion
      (5L, 3L, "purchase", 1 * day), (6L, 3L, "signup", 2 * day),
      // user 4: two purchases in window → FIRST one wins
      (7L, 4L, "signup", 0L), (8L, 4L, "purchase", 2 * day),
      (9L, 4L, "purchase", 4 * day))
    val dir = java.nio.file.Files.createTempDirectory("q171").toString
    rows.map { case (id, u, t, ts) => (id, u, t, ts, 1.0) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = ExtensionQueries25.q171_conversion_window(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(out == Map(1L -> 3 * day / 1000L, 4L -> 2 * day / 1000L),
      s"only users 1 and 4 convert, user 4 at the FIRST purchase: $out")
  }

  // ----------------------------------------------- q172 FK audit

  test("q172: planted orphans are counted exactly; clean relations certify zero") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q172").toString
    // 4 lineitems: one orphan orderkey, one orphan partkey
    Seq((1L, 10L, 100L), (2L, 10L, 100L), (99L, 10L, 100L), (1L, 99L, 100L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 5L), (2L, 5L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq(10L).toDF("p_partkey").write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq(100L).toDF("s_suppkey").write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((5L, 1)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq(1).toDF("n_nationkey").write.mode("overwrite").parquet(s"$dir/nation.parquet")
    val out = ExtensionQueries25.q172_fk_audit(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out("lineitem.orderkey") == ((4L, 1L, 250000L)), s"$out")
    assert(out("lineitem.partkey") == ((4L, 1L, 250000L)), s"$out")
    assert(out("lineitem.suppkey") == ((4L, 0L, 0L)), s"$out")
    assert(out("orders.custkey") == ((2L, 0L, 0L)), s"$out")
    assert(out("customer.nationkey") == ((1L, 0L, 0L)), s"$out")
  }
}
