package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries123

/** Driver-model pins for q452-q455 (records test, turning points, ACF
  * table, Fisher exact): recomputed from the collected sf0.001 daily
  * series in plain Scala + BigInt with the same truncation conventions.
  */
class ExtensionQueries123Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def daily(): Seq[(Long, Long)] =
    graft.core.Tables.events(spark, dir)
      .groupBy(expr("ts div 1000 div 86400000000").as("day"))
      .agg(count(lit(1)).as("n_ev"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)

  private def binom(m: Long, j: Long): Long =
    (1L to j).foldLeft(1L)((acc, t) => acc * (m - t + 1) / t)

  test("q452: record counts and harmonic expectation match the brute model") {
    val d = daily()
    val upper = d.indices.count(i => d.take(i).forall(_._2 < d(i)._2)).toLong
    val lower = d.indices.count(i => d.take(i).forall(_._2 > d(i)._2)).toLong
    val n = d.length.toLong
    val h = (1L to n).map(1000000L / _).sum
    val g = ExtensionQueries123.q452_records_test(spark, dir).collect().head
    assert((g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3)) ==
      ((n, upper, lower, h)))
    // a real series must have at least the first-day record on each side
    assert(upper >= 1L && lower >= 1L)
  }

  test("q453: turning-point count and null moments match the brute model") {
    val d = daily()
    val byDay = d.toMap
    val triples = d.flatMap { case (day, x) =>
      for (y <- byDay.get(day + 1); z <- byDay.get(day + 2)) yield (x, y, z)
    }
    val turning = triples.count { case (x, y, z) =>
      (y > x && y > z) || (y < x && y < z)
    }.toLong
    val n = d.length.toLong
    val g = ExtensionQueries123.q453_turning_points(spark, dir).collect().head
    assert((g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3), g.getLong(4)) ==
      ((n, triples.length.toLong, turning,
        2L * triples.length * 1000L / 3L, (16L * n - 29L) * 1000L / 90L)))
  }

  test("q454: correlogram rows equal the brute per-lag exact r2") {
    val d = daily()
    val byDay = d.toMap
    val expected = (1L to 7L).map { lag =>
      val pairs = d.flatMap { case (day, x) => byDay.get(day + lag).map(y => (x, y)) }
      val n = BigInt(pairs.length)
      val sx = BigInt(pairs.map(_._1).sum)
      val sy = BigInt(pairs.map(_._2).sum)
      val sxy = pairs.map(p => BigInt(p._1) * p._2).sum
      val sxx = pairs.map(p => BigInt(p._1) * p._1).sum
      val syy = pairs.map(p => BigInt(p._2) * p._2).sum
      val cov = n * sxy - sx * sy
      val r2 = (if (cov < 0) -1 else 1) * cov * cov * 1000000 /
        ((n * sxx - sx * sx) * (n * syy - sy * sy))
      (lag, pairs.length.toLong, cov.toLong, r2.toLong)
    }
    val got = ExtensionQueries123.q454_acf_table(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // lag-1 row must agree with q440's scalar by construction
  }

  test("q455: Fisher exact tail equals the brute hypergeometric model") {
    val d = daily()
    val n = d.length.toLong
    val total = d.map(_._2).sum
    val cells = d.map { case (day, ev) =>
      (Set(0L, 6L)((day + 4) % 7), ev * n > total)
    }
    val k = cells.count(_._1).toLong
    val nd = cells.count(_._2).toLong
    val a = cells.count(c => c._1 && c._2).toLong
    val tail = (a to math.min(k, nd)).map(i => binom(k, i) * binom(n - k, nd - i)).sum
    val p = tail * 1000000L / binom(n, nd)
    val g = ExtensionQueries123.q455_fisher_exact(spark, dir).collect().head
    assert((g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3),
      g.getLong(4), g.getLong(5)) == ((n, k, nd, a, tail, p)))
    // sanity: p is a probability in ppm
    assert(p >= 0L && p <= 1000000L)
  }
}
