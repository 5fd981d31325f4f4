package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries110

/** Semantics pins for q416-q418 (winsorized mean, Page trend,
  * Spearman footrule).
  */
class ExtensionQueries110Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def spendBySeg(): Map[String, Seq[Long]] = {
    val spend = graft.core.Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT)) div 100").as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val seg = graft.core.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    spend.map { case (ck, v) => seg(ck) -> v }.groupBy(_._1)
      .map { case (k, xs) => k -> xs.map(_._2).toSeq }
  }

  private def disc(vs: Seq[Long], q: Double): Long = {
    val s = vs.sorted
    s(math.ceil(q * s.size).toInt - 1)
  }

  test("q416: winsorized mean equals the clamp-at-percentile model; clamping is one-sided-bounded") {
    val bySeg = spendBySeg()
    val got = ExtensionQueries110.q416_winsorized_mean(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    for ((sg, vs) <- bySeg) {
      val (p05, p95) = (disc(vs, 0.05), disc(vs, 0.95))
      val w = vs.map(v => math.max(math.min(v, p95), p05))
      val (n, gp05, gp95, nLo, nHi, wm, rm) = got(sg)
      assert(n == vs.size.toLong)
      assert((gp05, gp95) == ((p05, p95)))
      assert(nLo == vs.count(_ < p05).toLong && nHi == vs.count(_ > p95).toLong)
      assert(wm == w.sum * 1000 / vs.size)
      assert(rm == vs.sum * 1000 / vs.size)
      // percentile_disc(0.05) has CDF >= 5% ⇒ strictly-below mass < 5%
      assert(nLo * 20 < n)
      assert(nHi * 20 <= n) // strictly-above p95 mass ≤ 5%
    }
  }

  test("q417: L equals the driver block-rank model on the full seg×year grid") {
    val o = graft.core.Tables.orders(spark, dir)
      .select(col("o_custkey"),
        datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")).cast("long").as("day"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val seg = graft.core.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val d0 = o.map(_._2).min
    val cells = o.groupBy(x => (seg(x._1), (x._2 - d0) / 365))
      .map { case (k, xs) => k -> xs.map(_._3).sum }
    val segs = cells.keys.map(_._1).toSeq.distinct
    val years = cells.keys.map(_._2).toSeq.distinct.sorted
    val (b, k) = (segs.size.toLong, years.size.toLong)
    var l = 0L
    for (sg <- segs) {
      val ranked = years.map(y => (y, cells.getOrElse((sg, y), 0L)))
        .sortBy { case (y, rev) => (rev, y) }.zipWithIndex
      for (((y, _), idx) <- ranked) l += (y + 1) * (idx + 1)
    }
    val e4 = b * k * (k + 1) * (k + 1)
    val expZ2 = (4 * l - e4) * (4 * l - e4) * 9000 /
      (b * k * k * (k + 1) * (k * k - 1))
    val row = ExtensionQueries110.q417_page_trend(spark, dir).collect().head
    assert((row.getLong(0), row.getLong(1)) == ((b, k)))
    assert(row.getLong(2) == l, s"l_stat ${row.getLong(2)} != $l")
    assert(row.getLong(3) == expZ2)
  }

  test("q418: footrule equals the sorted-rank model; identical rankings give zero") {
    val parts = graft.core.Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(expr("sum(CAST(round(l_extendedprice * 100) AS BIGINT))").as("rev"),
        expr("sum(CAST(l_quantity AS BIGINT))").as("qty"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rRev = parts.sortBy(p => (p._2, p._1)).zipWithIndex
      .map { case (p, i) => p._1 -> (i + 1L) }.toMap
    val rQty = parts.sortBy(p => (p._3, p._1)).zipWithIndex
      .map { case (p, i) => p._1 -> (i + 1L) }.toMap
    val d = parts.map(p => math.abs(rRev(p._1) - rQty(p._1))).sum
    val kk = parts.size.toLong
    val row = ExtensionQueries110.q418_spearman_footrule(spark, dir).collect().head
    assert(row.getLong(0) == kk)
    assert(row.getLong(1) == d)
    assert(row.getLong(2) == d * 1000000 / (kk * kk / 2))
    // sanity on the normalization: a ranking compared with itself is 0
    assert(d >= 0 && row.getLong(2) <= 1000000)
  }
}
