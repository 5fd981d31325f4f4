package graft

import graft.queries.ExtensionQueries54

/** Property pins for the round-9 forty-second batch (cross-engine
  * equality is the DuckDB oracle's job — these assert operator
  * SEMANTICS: planted violations, rate identities, independence
  * extremes).
  */
class ExtensionQueries54Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  private def tablesDir(prefix: String,
      orders: Seq[(Long, java.sql.Timestamp)],
      lines: Seq[(Long, java.sql.Timestamp)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    orders.map { case (k, d) => (k, k, "O", 1.0, d, "x") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    lines.zipWithIndex.map { case ((k, d), i) =>
      (k, i.toLong, i.toLong, i, 1.0, 1.0, 0.0, 0.0, "N", "O", d) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  // ----------------------------------------- q255 temporal sanity

  test("q255: planted backdated ship is counted with its worst gap") {
    def ts(day: Int) = new java.sql.Timestamp(day * 86400000L)
    val dir = tablesDir("q255",
      Seq((1L, ts(100)), (2L, ts(100))),
      Seq((1L, ts(90)),    // ships 10 days BEFORE order
        (2L, ts(105)),     // fine
        (2L, ts(600))))    // 500 days late -> over-1y violation
    val out = ExtensionQueries54.q255_temporal_sanity(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(out("ship_before_order") == ((3L, 1L, -10L)))
    assert(out("ship_over_1y_late") == ((3L, 1L, 135L)))
  }

  test("q255: real-data violations match a driver recount (the synthetic feed IS dirty)") {
    import org.apache.spark.sql.functions._
    // the generator draws l_shipdate independently of o_orderdate, so
    // ~47% of lines "ship before the order" — the audit catching real
    // dirt in the shipped testdata is the point of the operator
    val out = ExtensionQueries54.q255_temporal_sanity(spark, sfTiny)
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val lags = graft.core.Tables.orders(spark, sfTiny)
      .join(graft.core.Tables.lineitem(spark, sfTiny),
        col("o_orderkey") === col("l_orderkey"))
      .select(datediff(col("l_shipdate").cast("date"),
        col("o_orderdate").cast("date")).cast("long"))
      .collect().map(_.getLong(0))
    assert(out("ship_before_order") ==
      ((lags.count(_ < 0).toLong, math.min(lags.min, 0L))))
    assert(out("ship_over_1y_late") ==
      ((lags.count(_ > 365).toLong, math.max(lags.max - 365, 0L))))
  }

  // ----------------------------------------- q256 return rates

  test("q256: rate identities and base-rate constancy on real data") {
    val out = ExtensionQueries54.q256_return_rates(spark, sfTiny).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(4) == r.getLong(2) * 1000000L / r.getLong(1))
    }
    assert(out.map(_.getLong(5)).distinct.length == 1)
    val rates = out.map(_.getLong(4))
    assert(rates.reverse.sorted.sameElements(rates.reverse))
  }

  // ----------------------------------------- q257 NDV interaction

  test("q257: joint NDV bounds hold; factor is in (0, 1e6]") {
    val out = ExtensionQueries54.q257_ndv_interaction(spark, sfTiny)
      .collect()
    assert(out.length == 3)
    out.foreach { r =>
      val (n, nda, ndb, ndab) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))
      assert(ndab >= math.max(nda, ndb)) // joint at least each marginal
      assert(ndab <= math.min(nda * ndb, n))
      val factor = r.getLong(5)
      assert(factor > 0 && factor <= 1000000L)
      assert(factor == ndab * 1000000L / math.min(nda * ndb, n))
    }
  }
}
