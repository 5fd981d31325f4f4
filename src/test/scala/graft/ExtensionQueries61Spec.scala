package graft

import graft.queries.ExtensionQueries61

/** Property pins for the round-9 forty-ninth batch (cross-engine
  * equality is the DuckDB oracle's job — these assert operator
  * SEMANTICS: symmetric-edge identities, error-ordering attribution,
  * perfect-forecast zero).
  */
class ExtensionQueries61Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  // ------------------------------------- q276 assortativity

  test("q276: symmetric edge convention makes the degree sums equal") {
    val r = ExtensionQueries61.q276_degree_assortativity(spark, sfTiny)
      .collect()(0)
    assert(r.getLong(0) > 0)
    assert(r.getLong(1) == r.getLong(2)) // Σx = Σy for undirected edges
    assert(r.getLong(4) == r.getLong(3).sign)
  }

  test("q276: a star graph is exactly disassortative (negative numerator)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q276").toString
    // one order containing hub part 1 with leaves 2..6: star K_{1,5}...
    // co-purchase makes a clique per order, so use SEPARATE orders:
    // orders {1,k} for k in 2..6 -> edges 1-k only -> star
    val rows = (2L to 6L).flatMap(k => Seq((k, 1L), (k, k)))
    rows.zipWithIndex.map { case ((o, p), i) =>
      (o, p, p, i, 1.0, 1.0, 0.0, 0.0, "N", "O",
        new java.sql.Timestamp(0L)) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = ExtensionQueries61.q276_degree_assortativity(spark, dir)
      .collect()(0)
    // star: hub degree 5, leaves degree 1; directed edges 10.
    // E*Sxy - Sx*Sy = 10*(2*5*1*5) ... compute: pairs (5,1)x5,(1,5)x5:
    // sxy = 50, sx = sy = 30, E = 10 -> 500 - 900 = -400
    assert(r.getLong(3) == -400L && r.getLong(4) == -1L)
  }

  // ------------------------------------- q277 friction

  test("q277: post-purchase errors do not count as friction") {
    import spark.implicits._
    val m = 60000000000L
    // s1: error then purchase -> frictioned, converted
    // s2: purchase then error -> NOT frictioned, converted
    // s3: error only -> frictioned, not converted
    // s4: clean views -> not frictioned, not converted
    val rows = Seq(
      (1L, 1L, "error", 0 * m), (2L, 1L, "purchase", 1 * m),
      (3L, 2L, "purchase", 0 * m), (4L, 2L, "error", 1 * m),
      (5L, 3L, "error", 0 * m),
      (6L, 4L, "view", 0 * m))
      .map { case (id, u, t, ts) => (id, u, t, ts, 1.0) }
    val dir = java.nio.file.Files.createTempDirectory("q277").toString
    rows.toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = ExtensionQueries61.q277_friction_impact(spark, dir).collect()
      .map(r => r.getBoolean(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(out(true) == ((2L, 1L, 500000L)))   // s1, s3
    assert(out(false) == ((2L, 1L, 500000L)))  // s2, s4
  }

  // ------------------------------------- q278 forecast backtest

  test("q278: constant volume backtests to zero error; a step shows exact WAPE") {
    import spark.implicits._
    val weekNs = 7L * 86400000000000L
    def dirFor(prefix: String, perWeek: Seq[Int]): String = {
      val rows = perWeek.zipWithIndex.flatMap { case (n, wk) =>
        (1 to n).map(i => (wk * 1000L + i, i.toLong, "view",
          wk * weekNs + i * 1000L, 1.0))
      }
      val dir = java.nio.file.Files.createTempDirectory(prefix).toString
      rows.toDF("event_id", "user_id", "event_type", "ts", "value")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    val flat = ExtensionQueries61
      .q278_naive_forecast_backtest(spark, dirFor("q278a", Seq(10, 10, 10)))
      .collect()(0)
    assert(flat.getLong(0) == 2L && flat.getLong(1) == 0L)
    assert(flat.getLong(3) == 0L)

    // 10, 20, 20: errors |20-10| + |20-20| = 10; actual 40 -> 250000
    val step = ExtensionQueries61
      .q278_naive_forecast_backtest(spark, dirFor("q278b", Seq(10, 20, 20)))
      .collect()(0)
    assert(step.getLong(1) == 10L && step.getLong(2) == 40L)
    assert(step.getLong(3) == 250000L)
  }
}
