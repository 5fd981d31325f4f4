package graft

import graft.queries.{ExtensionQueries19, ExtensionQueries74}

/** Semantics pins for the recursive-CTE batch (q314-q316): the
  * hierarchy walk matches a driver-side recompute, the amortization
  * schedule terminates and conserves customers, and the recursive-CTE
  * BFS is row-for-row equal to the Pregel-loop BFS (q150).
  */
class ExtensionQueries74Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q314: depth histogram equals a driver-side walk to root") {
    val parts = graft.core.Tables.part(spark, dir)
      .select("p_partkey", "p_retailprice").collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
    def depth(k: Long): Int = {
      var c = k; var d = 0
      while (c > 0) { c = c / 4; d += 1 }
      d
    }
    val ref = parts.groupBy(p => depth(p._1)).view
      .mapValues(ps => (ps.length.toLong, ps.map(_._2).sum)).toMap
    val got = ExtensionQueries74.q314_recursive_hierarchy(spark, dir).collect()
      .map(r => r.getLong(0).toInt -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == ref)
    // conservation: every part lands in exactly one depth bucket
    assert(got.values.map(_._1).sum == parts.length.toLong)
  }

  test("q315: schedule matches a driver-side recompute and conserves customers") {
    val bals = graft.core.Tables.customer(spark, dir)
      .select("c_custkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .filter(_._2 > 0)
      .map(p => math.round(p._2 * 100))
    def months(b0: Long): (Int, Long) = {
      var bal = b0; var m = 0
      while (bal > 0 && m < 99) {
        val accrued = bal + bal / 100
        bal = accrued - math.max(10000L, accrued / 4)
        m += 1
      }
      (m, if (bal < 0) -bal else 0L)
    }
    val ref = bals.map(months).groupBy(_._1).view
      .mapValues(ms => (ms.length.toLong, ms.map(_._2).sum)).toMap
    val got = ExtensionQueries74.q315_recursive_payoff(spark, dir).collect()
      .map(r => r.getLong(0).toInt -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == ref)
    assert(got.values.map(_._1).sum == bals.length.toLong,
      "every positive balance pays off inside the belt bound")
    assert(got.keys.max <= 17, "25%-floor depth bound holds on TPC-H balances")
  }

  test("q316: recursive-CTE BFS equals the Pregel-loop BFS (q150) row-for-row") {
    val cte = ExtensionQueries74.q316_recursive_bfs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val pregel = ExtensionQueries19.q150_bfs_hops(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(cte == pregel)
  }
}
