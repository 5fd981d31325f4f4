package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries102

/** Semantics pins for the knapsack/switching/ESS batch (q397-q399). */
class ExtensionQueries102Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q397: knapsack equals the driver greedy; admit line is tight and optimal-order") {
    val docs = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val toks = r.getString(1).split(" ")
        (r.getLong(0), toks.length.toLong,
          toks.distinct.length * 1000000L / toks.length)
      }
    val greedy = docs.sortBy(d => (-d._3, d._1))
    var cum = 0L
    val admitted = greedy.takeWhile { d => cum += d._2; cum <= 20000L }
    val row = ExtensionQueries102.q397_token_budget_knapsack(spark, dir).collect().head
    assert(row.getLong(0) == docs.length.toLong)
    assert(row.getLong(1) == docs.map(_._2).sum)
    assert(row.getLong(2) == 20000L)
    assert(row.getLong(3) == admitted.length.toLong)
    assert(row.getLong(4) == admitted.map(_._2).sum)
    assert(row.getLong(5) == admitted.map(_._3).min)
    // the budget binds (corpus exceeds it), is respected, and the next
    // greedy doc would burst it
    assert(row.getLong(4) <= 20000L && row.getLong(1) > 20000L)
    assert(row.getLong(4) + greedy(admitted.length)._2 > 20000L)
  }

  test("q398: switching matrix equals the driver recount; shares sum per from-brand") {
    val li = graft.core.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ords = graft.core.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val brandOf = graft.core.Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = li.flatMap { case (ok, pk, c) =>
      ords.get(ok).map { case (cust, day) => (cust, day, brandOf(pk), c) } }
    val (d0, d1) = (rows.map(_._2).min, rows.map(_._2).max)
    val dSplit = d0 + (d1 - d0) / 2
    def dominant(xs: Seq[(String, Long)]): String =
      xs.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
        .maxBy { case (b, c) => (c, b) }._1
    val trans = rows.groupBy(_._1).values.flatMap { xs =>
      val first = xs.filter(_._2 <= dSplit).map(t => (t._3, t._4)).toSeq
      val second = xs.filter(_._2 > dSplit).map(t => (t._3, t._4)).toSeq
      if (first.isEmpty || second.isEmpty) None
      else Some((dominant(first), dominant(second)))
    }.toSeq
    val m = trans.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fromTot = trans.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val ref = m.map { case ((f, t), n) =>
      (f, t) -> (n, n * 1000000L / fromTot(f), if (f == t) 1L else 0L) }
    val got = ExtensionQueries102.q398_brand_switching(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == ref)
    // per from-brand the counts sum to its total and some loyalty exists
    for ((f, tot) <- fromTot)
      assert(got.collect { case ((`f`, _), (n, _, _)) => n }.sum == tot)
    assert(got.exists { case ((f, t), _) => f == t })
  }

  test("q399: ESS equals the driver weight math and prices the en-heavy skew") {
    val langN = graft.core.Tables.documents(spark, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = langN.values.sum
    val ws = langN.values.map(nl => (nl, 1000000L / nl))
    val sumW = ws.map { case (nl, w) => nl * w }.sum
    val sumW2 = ws.map { case (nl, w) => nl * w * w }.sum
    val ess = (BigInt(sumW) * sumW * 1000000 / (BigInt(n) * sumW2)).toLong
    val row = ExtensionQueries102.q399_effective_sample_size(spark, dir).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ==
      (n, sumW, sumW2, ess))
    // balanced-language weights on an en-heavy corpus cost real power:
    // ESS strictly below n but far from collapse
    assert(ess > 500000L && ess < 999999L, s"ess_ppm = $ess")
  }
}
