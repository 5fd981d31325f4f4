package graft

import graft.queries.ExtensionQueries29

/** Property pins for the round-9 seventeenth batch (cross-engine
  * equality is the DuckDB oracle's job — these assert operator
  * SEMANTICS: the chi-square verdict at hand-computed tables, Day-N
  * retention's exact day arithmetic, and QQ's ceil-rank order
  * statistics).
  */
class ExtensionQueries29Spec extends SparkSpecBase {

  private val dayNs = 86400000000000L

  private def eventsDir(prefix: String,
      rows: Seq[(Long, Long, String, Long, Double)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    rows.toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def ordersDir(prefix: String,
      rows: Seq[(Long, Double)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    rows.map { case (k, price) =>
      (k, k % 7, "O", price, new java.sql.Timestamp(86400000L * k), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  /** n purchase events for the user (ids offset to stay unique). */
  private def purchases(base: Long, user: Long, n: Int) =
    (1 to n).map(k => (base + k, user, "purchase", k * 60000000000L, 1.0))

  // ------------------------------------------------ q181 chi-square

  test("q181: independent table is not significant; perfectly dependent one is") {
    // 2x2 = [[5,5],[5,5]] (even users 0-19 split evenly): chi2 = 0
    val indep = (0L until 20L).flatMap { u =>
      val heavy = (u % 4) < 2 // half of each parity class heavy
      purchases(u * 1000, u, if (heavy) 14 else 1)
    }
    val r1 = ExtensionQueries29
      .q181_ab_chisquare(spark, eventsDir("q181i", indep)).collect()(0)
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getLong(3))
      == ((5L, 5L, 5L, 5L)))
    assert(r1.getLong(4) == 0L) // chi2_micro exactly 0
    assert(!r1.getBoolean(5))

    // all even users heavy, all odd users light: chi2 = N = 20
    val dep = (0L until 20L).flatMap { u =>
      purchases(u * 1000, u, if (u % 2 == 0) 14 else 1)
    }
    val r2 = ExtensionQueries29
      .q181_ab_chisquare(spark, eventsDir("q181d", dep)).collect()(0)
    assert((r2.getLong(0), r2.getLong(1), r2.getLong(2), r2.getLong(3))
      == ((10L, 0L, 0L, 10L)))
    assert(r2.getLong(4) == 20000000L) // chi2 = 20 exactly, in micro
    assert(r2.getBoolean(5))
  }

  test("q181: hand-computed borderline table gets the exact micro statistic") {
    // [[8,2],[4,6]]: N=20, ad-bc=40, num=20*1600=32000,
    // den=10*10*12*8=9600 -> chi2 = 3.3333.. (not significant at 3.841)
    val rows = (0L until 20L).flatMap { u =>
      val heavy = if (u % 2 == 0) (u / 2) < 8 else (u / 2) < 4
      purchases(u * 1000, u, if (heavy) 14 else 1)
    }
    val r = ExtensionQueries29
      .q181_ab_chisquare(spark, eventsDir("q181b", rows)).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((8L, 2L, 4L, 6L)))
    assert(r.getLong(4) == 3333333L)
    assert(!r.getBoolean(5))
  }

  // ------------------------------------------------ q182 retention

  test("q182: exact day offsets; first signup wins; zero rows survive") {
    val rows = Seq(
      // user 1 signs up day 0 (twice - first wins), active day 1 and 14
      (1L, 1L, "signup", 0L, 1.0), (2L, 1L, "signup", 5 * dayNs, 1.0),
      (3L, 1L, "view", 1 * dayNs + 7, 1.0), (4L, 1L, "click", 14 * dayNs + 9, 1.0),
      // user 2 signs up day 2, active day 3 (D1) and day 9 (D7)
      (5L, 2L, "signup", 2 * dayNs, 1.0),
      (6L, 2L, "view", 3 * dayNs, 1.0), (7L, 2L, "view", 9 * dayNs, 1.0),
      // user 3 signs up day 0, never returns
      (8L, 3L, "signup", 0L, 1.0))
    val out = ExtensionQueries29
      .q182_dayn_retention(spark, eventsDir("q182", rows)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.keySet == Set(1L, 7L, 14L))
    assert(out(1L) == ((3L, 2L, 666666L)))
    assert(out(7L) == ((3L, 1L, 333333L)))
    assert(out(14L) == ((3L, 1L, 333333L)))
  }

  test("q182: signup day itself does not count as retention (offset >= 1)") {
    val rows = Seq(
      (1L, 1L, "signup", 0L, 1.0), (2L, 1L, "view", 3600L * 1000000000L, 1.0))
    val out = ExtensionQueries29
      .q182_dayn_retention(spark, eventsDir("q182b", rows)).collect()
    assert(out.forall(_.getLong(2) == 0L))
  }

  // ------------------------------------------------ q183 QQ table

  test("q183: ceil-rank deciles on a hand distribution; gap is signed") {
    // half 0 (even keys): values 10,20,...,100; half 1 (odd): 15,25,...,105
    val rows = (1 to 10).flatMap { k =>
      Seq((2L * k, k * 10.0), (2L * k + 1, k * 10.0 + 5.0))
    }
    val dir = ordersDir("q183", rows)
    val out = ExtensionQueries29.q183_qq_drift(spark, dir).collect()
    assert(out.length == 10)
    out.foreach { r =>
      val k = r.getLong(0)
      // decile k of 10 values at ceil(10k/10)=k -> k-th smallest
      assert(r.getLong(1) == k * 1000L, s"va decile $k")
      assert(r.getLong(2) == k * 1000L + 500L, s"vb decile $k")
      assert(r.getLong(3) == -500L)
    }
  }

  test("q183: real data deciles are monotone and decile 10 is the max") {
    val out = ExtensionQueries29.q183_qq_drift(spark, "/root/testdata/sf0.001")
      .collect()
    val va = out.map(_.getLong(1))
    val vb = out.map(_.getLong(2))
    assert(va.sorted.sameElements(va) && vb.sorted.sameElements(vb))
    val o = graft.core.Tables.orders(spark, "/root/testdata/sf0.001")
    import org.apache.spark.sql.functions._
    val mx = o.agg(
      max(when(col("o_orderkey") % 2 === 0,
        round(col("o_totalprice") * 100).cast("long"))).as("ma"),
      max(when(col("o_orderkey") % 2 === 1,
        round(col("o_totalprice") * 100).cast("long"))).as("mb"))
      .collect()(0)
    assert(va.last == mx.getLong(0) && vb.last == mx.getLong(1))
  }
}
