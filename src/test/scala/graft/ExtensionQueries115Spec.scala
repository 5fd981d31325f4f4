package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries115

/** Semantics pins for q431 (Benjamini–Hochberg over exact sign
  * tests).
  */
class ExtensionQueries115Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q431: p-values, BH ranks, thresholds and the step-up set equal the driver model") {
    val ev = graft.core.Tables.events(spark, dir)
      .select((col("user_id") % 16).as("config"), expr("ts div 1000").as("us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val t0 = ev.map(_._2).min
    val daily = ev.groupBy(e => (e._1, (e._2 - t0) / 86400000000L))
      .map { case (k, xs) => k -> xs.map(_._3).sum }
    def binom(n: Long, k: Long): BigInt =
      (1L to k).foldLeft(BigInt(1))((a, i) => a * (n - i + 1) / i)
    val tests = daily.keys.map(_._1).toSeq.distinct.sorted.flatMap { c =>
      val pairs = daily.collect { case ((`c`, d), x) =>
        daily.get((c, d + 1)).map(y => (x, y)) }.flatten.filter(p => p._1 != p._2)
      if (pairs.isEmpty) None else {
        val n = pairs.size.toLong
        val s = pairs.count(p => p._2 > p._1).toLong
        val tail = (0L to math.min(s, n - s)).map(binom(n, _)).sum
        val p = (tail * 2 * 1000000 / (BigInt(1) << n.toInt)).min(1000000).toLong
        Some((c, n, s, p))
      }
    }
    val m = tests.size.toLong
    val ranked = tests.sortBy(t => (t._4, t._1)).zipWithIndex
      .map { case ((c, n, s, p), i) => (c, n, s, p, i + 1L, 50000L * (i + 1) / m) }
    val kStar = ranked.collect { case (_, _, _, p, r, th) if p <= th => r }
      .foldLeft(0L)(math.max)
    val expected = ranked.map { case (c, n, s, p, r, th) =>
      (c, n, s, p, r, th, if (r <= kStar) 1L else 0L) }.sortBy(_._1)
    val got = ExtensionQueries115.q431_benjamini_hochberg(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expected)
    // the cohorts are hash-assigned (null): BH should reject at most a
    // stray test, never a broad set
    assert(got.count(_._7 == 1L) <= 2, s"null design rejected ${got.count(_._7 == 1L)}")
    // the pairing is day-over-day inside a 30-day window: n is bounded
    // by 29 and positive (sf0.001's ~50 users leave some configs with
    // gap days, so the floor stays loose)
    assert(got.nonEmpty && got.forall(t => t._2 >= 1L && t._2 <= 29L))
  }
}
