package graft

import graft.queries.ExtensionQueries62

/** Property pins for the round-9 fiftieth batch (cross-engine equality
  * is the DuckDB oracle's job — these assert operator SEMANTICS:
  * first-introduction attribution, independence zero, persistence
  * extremes).
  */
class ExtensionQueries62Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  // ---------------------------------------- q279 exploration

  test("q279: repeat orders are not exploratory; mixed baskets are, but not pure") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q279").toString
    def ts(day: Int) = new java.sql.Timestamp(day * 86400000L)
    // customer 1: order 1 (day 0) parts {10, 20} -> pure exploration;
    // order 2 (day 1) parts {10} -> repeat-only;
    // order 3 (day 2) parts {10, 30} -> exploratory (30 new) but mixed
    Seq((1L, ts(0)), (2L, ts(1)), (3L, ts(2)))
      .map { case (k, d) => (k, 1L, "O", 1.0, d, "x") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 10L), (1L, 20L), (2L, 10L), (3L, 10L), (3L, 30L))
      .zipWithIndex.map { case ((o, p), i) =>
        (o, p, p, i, 1.0, 1.0, 0.0, 0.0, "N", "O", ts(0)) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = ExtensionQueries62.q279_exploration_rate(spark, dir).collect()(0)
    assert(r.getLong(0) == 3L)
    assert(r.getLong(1) == 2L) // orders 1 and 3
    assert(r.getLong(2) == 1L) // only order 1 is pure
    assert(r.getLong(3) == 666666L && r.getLong(4) == 333333L)
  }

  // ---------------------------------------- q280 interaction

  test("q280: an exactly independent 2x2 yields zero chi-square") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q280").toString
    // disc x ret perfectly proportional: 10/10/10/10
    val rows =
      Seq.fill(10)((0.1, "R")) ++ Seq.fill(10)((0.1, "N")) ++
        Seq.fill(10)((0.0, "R")) ++ Seq.fill(10)((0.0, "N"))
    rows.zipWithIndex.map { case ((disc, rf), i) =>
      (i.toLong, i.toLong, i.toLong, i, 1.0, 1.0, disc, 0.0, rf, "O",
        new java.sql.Timestamp(0L)) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = ExtensionQueries62
      .q280_discount_return_interaction(spark, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((10L, 10L, 10L, 10L)))
    assert(r.getLong(4) == 0L && !r.getBoolean(5))
  }

  test("chi-square stays exact past the DECIMAL(38,0) ceiling (planted >1e38 numerator)") {
    import spark.implicits._
    // billions per cell: num = n·(ad−bc)²·1e6 ≈ 1.75e53 — the round-10
    // chained-DECIMAL tail returned NULL here; the BigInt fold must not
    val (a, b, c, d) = (2000000000L, 1000000000L, 1000000000L, 3000000000L)
    val r = graft.queries.ExtensionQueries29.chiSquareExact(spark,
      Seq((a, b, c, d)).toDF("a", "b", "c", "d")).collect()(0)
    // independent unbounded-integer replay of the statistic
    def bi(x: Long) = BigInt(x)
    val num = (bi(a) + bi(b) + bi(c) + bi(d)) *
      (bi(a) * bi(d) - bi(b) * bi(c)).pow(2) * 1000000
    val den = (bi(a) + bi(b)) * (bi(c) + bi(d)) * (bi(a) + bi(c)) * (bi(b) + bi(d))
    assert(num > BigInt(10).pow(38), "fixture must actually cross the old ceiling")
    assert(!r.isNullAt(4), "chi2 went NULL — the DECIMAL cliff is back")
    assert(r.getLong(4) == (num / den).longValue)
    assert(r.getBoolean(5) == (num > den * 3841459))
  }

  // ---------------------------------------- q281 persistence

  test("q281: a monotone ramp is positively persistent; alternation is negative") {
    import spark.implicits._
    val weekNs = 7L * 86400000000000L
    def dirFor(prefix: String, perWeek: Seq[Int]): String = {
      val rows = perWeek.zipWithIndex.flatMap { case (n, wk) =>
        (1 to n).map(i => (wk * 10000L + i, i.toLong, "view",
          wk * weekNs + i * 1000L, 1.0))
      }
      val dir = java.nio.file.Files.createTempDirectory(prefix).toString
      rows.toDF("event_id", "user_id", "event_type", "ts", "value")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    val ramp = ExtensionQueries62
      .q281_volume_persistence(spark, dirFor("q281a", Seq(10, 20, 30, 40)))
      .collect()(0)
    assert(ramp.getLong(2) == 1L, s"ramp: $ramp")
    val alt = ExtensionQueries62
      .q281_volume_persistence(spark,
        dirFor("q281b", Seq(10, 40, 10, 40, 10)))
      .collect()(0)
    assert(alt.getLong(2) == -1L, s"alternation: $alt")
  }
}
