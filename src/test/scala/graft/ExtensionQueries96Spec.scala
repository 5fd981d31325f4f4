package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries96

/** Semantics pins for the CUPED/RBO/Neyman batch (q379-q381). */
class ExtensionQueries96Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q379: CUPED equals the driver moment math; reduction is rho-squared-shaped") {
    val o = graft.core.Tables.orders(spark, dir)
      .select(col("o_custkey"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT) div 100"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val (d0, d1) = (o.map(_._2).min, o.map(_._2).max)
    val dSplit = d0 + (d1 - d0) / 2
    val cust = o.groupBy(_._1).map { case (_, xs) =>
      (xs.filter(_._2 <= dSplit).map(_._3).sum, xs.filter(_._2 > dSplit).map(_._3).sum)
    }.toSeq
    val n = BigInt(cust.length)
    val (sx, sy) = (BigInt(cust.map(_._1).sum), BigInt(cust.map(_._2).sum))
    val sxy = cust.map(c => BigInt(c._1) * c._2).sum
    val sxx = cust.map(c => BigInt(c._1) * c._1).sum
    val syy = cust.map(c => BigInt(c._2) * c._2).sum
    val cov = n * sxy - sx * sy
    val (p2x, p2y) = (n * sxx - sx * sx, n * syy - sy * sy)
    val theta = (cov * 1000000 / p2x).toLong
    val varRed = ((cov / 1000000) * (cov / 1000000) * 1000000 /
      ((p2x / 1000000) * (p2y / 1000000))).toLong
    val row = ExtensionQueries96.q379_cuped(spark, dir).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(row.getLong(1) == (sx / n).toLong && row.getLong(2) == (sy / n).toLong)
    assert(row.getLong(3) == theta && row.getLong(4) == varRed)
    // pre/post spend are near-independent in this synthetic corpus: the
    // reduction must be tiny but the identity rho2 ~ theta^2 * P2x/P2y
    // must hold to within the documented truncation
    assert(varRed >= 0L && varRed < 100000L, s"var_reduction_ppm = $varRed")
    val rhs = BigInt(theta) * theta * p2x / p2y / 1000000
    assert((varRed - rhs.toLong).abs <= math.max(5L, rhs.toLong / 10),
      s"rho2 $varRed vs theta-based $rhs")
  }

  test("q380: RBO equals the driver depth math; truncated ranker overlaps but degrades") {
    val suffix = Seq(235416L, 135416L, 90416L, 63416L, 45191L, 32069L,
      22228L, 14636L, 8657L, 3874L)
    val vecs = graft.core.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def topk(dims: Int): Map[Long, Seq[Long]] = {
      def dot(a: Array[Double], b: Array[Double]) =
        (0 until dims).map(i => a(i) * b(i)).sum
      vecs.filter(_._1 < 10).map { case (pid, pv) =>
        pid -> vecs.filter(_._1 != pid)
          .map { case (cid, cv) =>
            (cid, dot(pv, cv) / (math.sqrt(dot(pv, pv)) * math.sqrt(dot(cv, cv)))) }
          .sortBy { case (cid, cos) => (-cos, cid) }.take(10).map(_._1).toSeq
      }.toMap
    }
    val (a, b) = (topk(64), topk(8))
    val ref = a.keys.map { pid =>
      val ra = a(pid).zipWithIndex.toMap
      val rb = b(pid).zipWithIndex.toMap
      val shared = ra.keySet.intersect(rb.keySet)
      pid -> (shared.size.toLong,
        shared.toSeq.map(c => suffix(math.max(ra(c), rb(c)))).sum,
        if (a(pid).headOption == b(pid).headOption &&
          shared.contains(a(pid).head)) 1L else 0L)
    }.toMap
    val got = ExtensionQueries96.q380_rbo(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == ref.filter(_._2._1 > 0))
    // 8 of 64 dims: real but degraded agreement — neither identical
    // (651319 everywhere) nor disjoint (no rows)
    assert(got.nonEmpty)
    assert(got.values.forall(_._2 < 651319L))
    assert(got.values.exists(_._1 >= 2L), s"truncated ranker never overlaps: $got")
  }

  test("q381: Neyman allocation equals the driver design math and sums to ~budget") {
    val base = graft.core.Tables.orders(spark, dir)
      .select(col("o_orderpriority"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT) div 100"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val strata = base.groupBy(_._1).map { case (p, xs) =>
      val n = BigInt(xs.length)
      val s1 = BigInt(xs.map(_._2).sum)
      val s2 = xs.map(x => BigInt(x._2) * x._2).sum
      val s = math.sqrt(((n * s2 - s1 * s1) / (n * (n - 1))).toDouble).floor.toLong
      p -> (n.toLong, s)
    }
    val total = strata.values.map { case (n, s) => n * s }.sum
    val ref = strata.map { case (p, (n, s)) => p -> (n, s, n * s * 10000 / total) }
    val got = ExtensionQueries96.q381_neyman_allocation(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == ref)
    // allocations are per-stratum floors of a 10k budget: the sum lands
    // within a row-count of the budget, and no stratum is starved
    val alloc = got.values.map(_._3).sum
    assert(alloc <= 10000L && alloc >= 10000L - got.size)
    assert(got.values.forall(_._3 > 0L))
  }
}
