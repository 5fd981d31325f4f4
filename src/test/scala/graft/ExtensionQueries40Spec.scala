package graft

import graft.queries.ExtensionQueries40

/** Property pins for the round-9 twenty-eighth batch (cross-engine
  * equality is the DuckDB oracle's job — these assert operator
  * SEMANTICS: duration weighting and censoring, ABC boundary policy,
  * percentile/SLA accounting).
  */
class ExtensionQueries40Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  // --------------------------------------------------- q213 TWAP

  test("q213: hand series — long-held cheap value dominates a brief spike") {
    import spark.implicits._
    val m = 60000000000L
    // type X: value 100c held 9 min, then 1000c held 1 min, then end
    // (censored). TWAP = (100*9 + 1000*1) / 10 = 190c. Plain mean = 550c.
    val rows = Seq(
      (1L, 1L, "X", 0 * m, 1.0), (2L, 1L, "X", 9 * m, 10.0),
      (3L, 1L, "X", 10 * m, 123.0))
    val dir = java.nio.file.Files.createTempDirectory("q213").toString
    rows.toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = ExtensionQueries40.q213_twap(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == 2L) // final observation censored
    assert(r(0).getLong(2) == 10L * 60000000L)
    assert(r(0).getLong(3) == 190L)
  }

  // --------------------------------------------- q214 ABC classes

  test("q214: classes partition all parts; shares are ~80/15/5-shaped and ordered") {
    val out = ExtensionQueries40.q214_abc_classification(spark, sfTiny)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet == Set("A", "B", "C"))
    val nParts = graft.core.Tables.lineitem(spark, sfTiny)
      .select("l_partkey").distinct().count()
    assert(out.values.map(_._1).sum == nParts)
    // cumulative share through A is <= 80%; through A+B <= 95%
    assert(out("A")._3 <= 800000L)
    assert(out("A")._3 + out("B")._3 <= 950000L)
    // shares sum to ~1e6 (truncation loses < 3 ppm)
    val total = out.values.map(_._3).sum
    assert(total > 1000000L - 3 && total <= 1000000L)
  }

  test("q214: hand curve — boundary part lands in the earlier class") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q214").toString
    // revenues 80, 15, 5: part 1 cum=80% exactly -> A; part 2 cum=95% -> B
    val rows = Seq((1L, 1L, 80.0), (2L, 2L, 15.0), (3L, 3L, 5.0))
    rows.map { case (o, p, price) => (o, p, p, 1, 1.0, price, 0.0, 0.0,
        "N", "O", new java.sql.Timestamp(0L)) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = ExtensionQueries40.q214_abc_classification(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("A" -> 1L, "B" -> 1L, "C" -> 1L))
  }

  // ----------------------------------------- q215 latency SLA

  test("q215: percentiles are true order statistics; SLA accounting closes") {
    import org.apache.spark.sql.functions._
    val out = ExtensionQueries40.q215_fulfillment_latency(spark, sfTiny)
      .collect()
    assert(out.nonEmpty)
    val lat = graft.core.Tables.orders(spark, sfTiny)
      .join(graft.core.Tables.lineitem(spark, sfTiny),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("l_shipdate").cast("date"),
          col("o_orderdate").cast("date")).cast("long").as("days"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).sorted).toMap
    out.foreach { r =>
      val days = lat(r.getString(0))
      val n = days.length
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == days((n + 1) / 2 - 1), s"p50 ${r.getString(0)}")
      assert(r.getLong(3) == days((n * 9 + 9) / 10 - 1), s"p90 ${r.getString(0)}")
      assert(r.getLong(4) == days.count(_ <= 30) * 1000000L / n)
    }
  }
}
