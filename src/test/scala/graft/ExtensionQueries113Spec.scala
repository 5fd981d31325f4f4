package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries113

/** Semantics pins for q426-q428 (prefix dedup, rich club,
  * Wasserstein-1).
  */
class ExtensionQueries113Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q426: pairs equal the brute-force startsWith scan; coverage is in (0, 1]") {
    val docs = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.split(" ", -1).length >= 6)
    val expected = (for {
      (ia, ta) <- docs; (ib, tb) <- docs
      if (ta.length < tb.length || (ta.length == tb.length && ia < ib)) &&
        tb.startsWith(ta)
    } yield (ia, ib, ta.length.toLong, tb.length.toLong,
        ta.length.toLong * 1000000 / tb.length)).sorted.toSeq
    val got = ExtensionQueries113.q426_prefix_dedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == expected)
    assert(got.nonEmpty, "corpus plants prefix near-dups; empty pins nothing")
    assert(got.forall(p => p._5 > 0 && p._5 <= 1000000))
  }

  test("q427: rich-club density equals the brute-force subgraph count and never exceeds 1") {
    val rows = ExtensionQueries113.q427_rich_club(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(2L, 4L, 8L, 16L))
    // recompute from the same edge rule, brute force
    val lp = graft.core.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = lp.groupBy(_._1).values
    // filter+keySet, NOT Map.collect-to-tuples: collect on a Map whose
    // results are pairs builds a MAP keyed by the pair's first element
    // and silently collapses edges sharing a left endpoint (the same
    // re-key trap as the q407/q412 spec groupBy)
    val edges = byOrder.flatMap { xs =>
      val ps = xs.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- ps.indices if i < j) yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keySet
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    for ((k, nK, eK, phi) <- rows) {
      val rich = deg.filter(_._2 > k).keySet
      val expN = rich.size.toLong
      val expE = edges.count(e => rich(e._1) && rich(e._2)).toLong
      assert((nK, eK) == ((expN, expE)), s"k=$k")
      assert(phi == (if (expN <= 1) 0L else 2 * expE * 1000000 / (expN * (expN - 1))))
      assert(phi <= 1000000)
    }
    // density must not DECREASE as the club tightens on this corpus's
    // co-purchase graph... not guaranteed in general; just pin n_k monotone
    assert(rows.map(_._2).sliding(2).forall { case Array(a, b) => b <= a; case _ => true })
  }

  test("q428: W1 equals the direct quantile-coupling computation") {
    val spend = graft.core.Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT)) div 100").as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val seg = graft.core.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val (a, b) = spend.partition { case (ck, _) => seg(ck) == "BUILDING" }
    val (xs, ys) = (a.map(_._2).sorted, b.map(_._2).sorted)
    // ∫|F_A − F_B| dx over the pooled grid, directly
    val grid = (xs ++ ys).distinct.sorted
    var area = BigInt(0)
    for (Seq(lo, hi) <- grid.sliding(2).map(_.toSeq) if hi > lo) {
      val fa = xs.count(_ <= lo).toLong * ys.length
      val fb = ys.count(_ <= lo).toLong * xs.length
      area += BigInt(hi - lo) * math.abs(fa - fb)
    }
    val exp = (area * 1000 / (BigInt(xs.length) * ys.length)).toLong
    val row = ExtensionQueries113.q428_wasserstein(spark, dir).collect().head
    assert(row.getLong(0) == xs.length.toLong && row.getLong(1) == ys.length.toLong)
    assert(row.getLong(2) == exp, s"w1_milli ${row.getLong(2)} != $exp")
  }
}
