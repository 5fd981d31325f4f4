package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries107

/** Semantics pins for the rank-inference/sequential batch (q407-q409):
  * every statistic re-derived on the driver from first principles
  * (sorted midranks, BigInt binomials, a straight fold over the daily
  * series) and compared exactly.
  */
class ExtensionQueries107Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def spendBySeg(): Seq[(String, Long)] = {
    val spend = graft.core.Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT)) div 100").as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val seg = graft.core.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    spend.map { case (ck, v) => seg(ck) -> v }.toSeq
  }

  test("q407: H equals the driver midrank model (ANOVA-on-ranks identity)") {
    val data = spendBySeg()
    val n = data.size.toLong
    // midranks from a plain sort: value -> average rank of its ties, doubled
    val sorted = data.map(_._2).sorted
    val r2 = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, xs) => v -> xs.map(_._2 + 1L).map(_ * 2L).sum / xs.size }
    // .toSeq BEFORE .map: mapping a Map to (size, sum) pairs would re-key
    // by size and silently collapse equal-sized groups
    val groups = data.groupBy(_._1).toSeq.map { case (_, xs) =>
      (xs.size.toLong, xs.map(x => r2(x._2)).sum) }
    val s1 = data.map(x => r2(x._2)).sum
    val s2 = data.map(x => BigInt(r2(x._2)) * r2(x._2)).sum
    val num = groups.map { case (ng, sg) =>
      val e = (n * sg - ng * s1) / ng // truncation matches `div`
      BigInt(ng) * e * e
    }.sum
    val expected = ((n - 1) * num * 1000 /
      (BigInt(n) * (n * s2 - BigInt(s1) * s1))).toLong
    val row = ExtensionQueries107.q407_kruskal_wallis(spark, dir).collect().head
    assert(row.getLong(0) == n)
    assert(row.getLong(3) == expected, s"h_milli ${row.getLong(3)} != $expected")
  }

  test("q408: exact binomial tail equals BigInt enumeration; null-ish p on this corpus") {
    val row = ExtensionQueries107.q408_sign_test(spark, dir).collect().head
    val (n, s, tail, p) = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    assert(n > 10 && s >= 0 && s <= n)
    def c(nn: Long, kk: Long): BigInt =
      (1L to kk).foldLeft(BigInt(1))((a, i) => a * (nn - i + 1) / i)
    val m = math.min(s, n - s)
    val expTail = (0L to m).map(c(n, _)).sum
    assert(BigInt(tail) == expTail)
    val expP = (expTail * 2 * 1000000 / (BigInt(1) << n.toInt)).min(1000000).toLong
    assert(p == expP)
  }

  test("q409: drawdown equals a straight fold over the daily deviation series") {
    val daily = graft.core.Tables.orders(spark, dir)
      .groupBy(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("day"))
      .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT)) div 100").as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = daily.size.toLong
    val sx = daily.map(_._2).sum
    var c = 0L; var peak = Long.MinValue
    var bestDd = Long.MinValue; var bestDay = -1L; var bestPeak = 0L
    val cums = daily.map { case (day, x) =>
      c += n * x - sx
      peak = math.max(peak, c)
      if (peak - c > bestDd) { bestDd = peak - c; bestDay = day; bestPeak = peak }
      (day, c)
    }
    val rec = cums.find { case (day, cv) => day > bestDay && cv >= bestPeak }
      .map(_._1).getOrElse(-1L)
    val row = ExtensionQueries107.q409_drawdown(spark, dir).collect().head
    assert(row.getLong(0) == bestDay)
    assert(row.getLong(1) == bestDd / n)
    assert(row.getLong(2) == bestDd)
    assert(row.getLong(3) == rec)
  }
}
