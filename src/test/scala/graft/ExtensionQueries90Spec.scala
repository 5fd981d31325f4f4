package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries90

/** Semantics pins for the graph/multiset/lag batch (q361-q363):
  * driver-side recomputation plus structural identities.
  */
class ExtensionQueries90Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q361: modularity equals the driver recount; identities hold; brand partition reads null") {
    val lp = graft.core.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = lp.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).sorted
      for (i <- ps.indices; j <- ps.indices if i < j) yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val brandOf = graft.core.Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val e2 = edges.map { case (a, b) => (brandOf(a), brandOf(b)) }
    val m = e2.size.toLong
    val deg = (e2.map(_._1) ++ e2.map(_._2)).groupBy(identity)
      .map { case (b, xs) => b -> xs.size.toLong }
    val intra = e2.filter(p => p._1 == p._2).groupBy(_._1)
      .map { case (b, xs) => b -> xs.size.toLong }
    val ref = deg.map { case (b, d) =>
      val l = intra.getOrElse(b, 0L)
      b -> (l, d,
        (BigInt(4 * m * l - d * d) * 1000000 / (4 * m * m)).toLong)
    }
    val got = ExtensionQueries90.q361_modularity(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == ref)
    // identities: degrees sum to 2m, intra edges can't exceed m
    assert(got.values.map(_._2).sum == 2 * m)
    assert(got.values.map(_._1).sum <= m)
    // brands are assigned independently of the co-purchase structure, so
    // the partition's total modularity must sit near zero — the score
    // correctly reads "not a community structure"
    val q = got.values.map(_._3).sum
    assert(math.abs(q) < 100000L, s"random partition scored Q = $q ppm")
  }

  test("q362: weighted Jaccard equals the driver multiset recount, all pairs present") {
    val docs = graft.core.Tables.documents(spark, dir)
      .filter(col("doc_id") < 25).select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ").groupBy(identity).map { case (t, xs) => t -> xs.length.toLong })
      .toMap
    val ref = (for {
      a <- docs.keys; b <- docs.keys if a < b
      interMin = docs(a).keySet.intersect(docs(b).keySet).toSeq
        .map(t => math.min(docs(a)(t), docs(b)(t))).sum
      ta = docs(a).values.sum; tb = docs(b).values.sum
      un = ta + tb - interMin
    } yield (a, b) -> (interMin, un, interMin * 1000000L / un)).toMap
    val got = ExtensionQueries90.q362_weighted_jaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == ref)
    assert(got.size == 300, s"expected all C(25,2) pairs, got ${got.size}")
    assert(got.values.forall { case (_, _, j) => j >= 0L && j <= 1000000L })
    // word-soup docs share the small vocabulary: similarity must be
    // strictly positive everywhere yet never identity
    assert(got.values.forall(_._3 > 0L) && got.values.forall(_._3 < 1000000L))
  }

  test("q363: lag covariance equals the driver series math; mirror identity holds") {
    val ev = graft.core.Tables.events(spark, dir)
      .select(expr("ts div 86400000000000").as("day"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val days = ev.map(_._1).distinct.sorted
    val x = days.map(d => d -> ev.count(e => e._1 == d && e._2 == "click").toLong).toMap
    val y = days.map(d => d -> ev.count(e => e._1 == d && e._2 == "purchase").toLong).toMap
    def stats(k: Long) = {
      val sup = days.filter(d => y.contains(d + k))
      val n = sup.length.toLong
      val sxy = sup.map(d => x(d) * y(d + k)).sum
      val sx = sup.map(x).sum
      val sy = sup.map(d => y(d + k)).sum
      (n, sxy, sx, sy, n * sxy - sx * sy)
    }
    val got = ExtensionQueries90.q363_lag_correlation(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == (-3L to 3L).map(k => k -> stats(k)).toMap)
    // support shrinks away from lag 0 on a contiguous-ish day range
    assert(got(0L)._1 >= got(3L)._1 && got(0L)._1 >= got(-3L)._1)
    // mirror identity: swapping the series negates the lag — cov(x,y,k)
    // computed from the same sums equals cov(y,x,-k)
    def swapped(k: Long) = {
      val sup = days.filter(d => x.contains(d + k))
      val n = sup.length.toLong
      n * sup.map(d => y(d) * x(d + k)).sum - sup.map(y).sum * sup.map(d => x(d + k)).sum
    }
    for (k <- -3L to 3L)
      assert(got(k)._5 == swapped(-k), s"mirror identity broke at lag $k")
  }
}
