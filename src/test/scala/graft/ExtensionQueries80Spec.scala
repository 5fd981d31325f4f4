package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries80

/** Semantics pins for the optimizer-stat/percentile batch (q332-q334):
  * exact order statistics and the multiplicity census recompute
  * driver-side.
  */
class ExtensionQueries80Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def ceilRankStat(sorted: IndexedSeq[Long], num: Long, den: Long): Long =
    sorted((((sorted.size * num + den - 1) / den) - 1).toInt)

  test("q332: decile boundaries are the exact ceil-rank stats; masses conserve") {
    val cents = graft.core.Tables.orders(spark, dir)
      .select(round(col("o_totalprice") * 100).cast("long")).collect()
      .map(_.getLong(0)).sorted.toIndexedSeq
    val rows = ExtensionQueries80.q332_equidepth_hist(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    (1 to 10).foreach { k =>
      assert(rows(k.toLong)._1 == ceilRankStat(cents, k.toLong, 10L), s"boundary $k")
    }
    assert(rows.values.map(_._2).sum == cents.size.toLong, "mass conservation")
    // each bucket's mass equals the count in (prev boundary, boundary]
    (1 to 10).foreach { k =>
      val lo = if (k == 1) Long.MinValue else rows(k.toLong - 1)._1
      val hi = rows(k.toLong)._1
      assert(rows(k.toLong)._2 == cents.count(c => c > lo && c <= hi).toLong)
    }
  }

  test("q333: p50/p90/p99 equal the driver ceil-rank stats per priority") {
    val lat = spark.sql(
      s"""SELECT o.o_orderpriority AS prio,
         |  CAST(datediff(CAST(l.l_shipdate AS DATE),
         |    CAST(o.o_orderdate AS DATE)) AS BIGINT) AS days
         |FROM parquet.`$dir/lineitem.parquet` l
         |JOIN parquet.`$dir/orders.parquet` o
         |  ON l.l_orderkey = o.o_orderkey""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val rows = ExtensionQueries80.q333_latency_percentiles(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    lat.groupBy(_._1).foreach { case (prio, ds) =>
      val s = ds.map(_._2).sorted.toIndexedSeq
      assert(rows(prio) == ((s.size.toLong,
        ceilRankStat(s, 50, 100), ceilRankStat(s, 90, 100),
        ceilRankStat(s, 99, 100))), prio)
    }
  }

  test("q334: multiplicity census equals the driver recompute and conserves the join") {
    val nl = graft.core.Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val no = graft.core.Tables.orders(spark, dir)
      .groupBy(col("o_orderkey")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ms = (nl.keySet ++ no.keySet).toSeq
      .map(k => nl.getOrElse(k, 0L) * no.getOrElse(k, 0L))
    val ref = ms.groupBy(m =>
        if (m == 0) 0L else java.lang.Long.toBinaryString(m).length.toLong)
      .map { case (b, xs) => b -> (xs.size.toLong, xs.sum) }
    val rows = ExtensionQueries80.q334_join_multiplicity(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows == ref)
    // Σ output_rows == the true join cardinality
    val joinRows = graft.core.Tables.lineitem(spark, dir).as("l")
      .join(graft.core.Tables.orders(spark, dir).as("o"),
        col("l.l_orderkey") === col("o.o_orderkey")).count()
    assert(rows.values.map(_._2).sum == joinRows)
  }
}
