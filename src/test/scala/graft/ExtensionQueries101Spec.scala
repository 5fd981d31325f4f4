package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries101

/** Semantics pins for the attribution/nonparametric/reweighting batch
  * (q394-q396).
  */
class ExtensionQueries101Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q394: Shapley equals the driver coalition math; efficiency axiom holds") {
    val users = graft.core.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (_, xs) =>
        val t = xs.map(_._2).toSet
        val mask = (if (t("click")) 1 else 0) + (if (t("view")) 2 else 0) +
          (if (t("signup")) 4 else 0)
        (mask, if (t("purchase")) 1L else 0L)
      }.toSeq
    val v = (0 to 7).map { m =>
      val g = users.filter(_._1 == m)
      if (g.isEmpty) 0L else g.map(_._2).sum * 1000000L / g.size
    }
    def phi(bit: Int): Long = {
      val others = (0 to 2).filter(_ != bit).map(1 << _)
      val subsets = Seq(0, others(0), others(1), others(0) | others(1))
      val w = Map(0 -> 2L, 1 -> 1L, 2 -> 2L)
      subsets.map { sm =>
        w(Integer.bitCount(sm)) * (v(sm | (1 << bit)) - v(sm))
      }.sum / 6
    }
    val ref = Map("click" -> phi(0), "view" -> phi(1), "signup" -> phi(2))
    val got = ExtensionQueries101.q394_shapley_attribution(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.view.mapValues(_._1).toMap == ref)
    assert(got.values.forall(t => t._2 == v(7) && t._3 == v(0)))
    // efficiency: credits telescope to v(full) − v(∅) within the three
    // div-by-6 truncations
    val total = got.values.map(_._1).sum
    assert(math.abs(total - (v(7) - v(0))) <= 3, s"sum phi $total vs ${v(7) - v(0)}")
  }

  test("q395: signed-rank equals the driver rank recount; halves don't differ") {
    val o = graft.core.Tables.orders(spark, dir)
      .select(col("o_custkey"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT) div 100"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val (d0, d1) = (o.map(_._2).min, o.map(_._2).max)
    val dSplit = d0 + (d1 - d0) / 2
    val diffs = o.groupBy(_._1).values.map { xs =>
      xs.filter(_._2 > dSplit).map(_._3).sum - xs.filter(_._2 <= dSplit).map(_._3).sum
    }.filter(_ != 0L).toSeq
    val n = diffs.length.toLong
    val byAd = diffs.groupBy(math.abs).toSeq.sortBy(_._1)
    var cum = 0L
    var w2 = 0L
    var tie48 = 0L
    for ((_, xs) <- byAd) {
      val c = xs.length.toLong
      val np = xs.count(_ > 0).toLong
      w2 += np * (2 * cum + c + 1)
      tie48 += c * c * c - c
      cum += c
    }
    val num2 = w2 - n * (n + 1) / 2
    val v48 = 2 * n * (n + 1) * (2 * n + 1) - tie48
    val z = num2 * 1000L / math.sqrt((v48 / 12).toDouble).floor.toLong
    val row = ExtensionQueries101.q395_wilcoxon_signed_rank(spark, dir).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4)) == (n, w2, num2, v48, z))
    // the span halves are exchangeable: |z| must read insignificant
    assert(math.abs(z) < 3000L, s"z_milli = $z")
    // rank-sum identity: W+ + W- covers all ranks — 2W+ ≤ 2·Σranks
    assert(w2 >= 0L && w2 <= 2 * (n * (n + 1) / 2))
  }

  test("q396: post-stratified contributions equal the driver reweighting") {
    val pop = graft.core.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val orders = graft.core.Tables.orders(spark, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nTotal = pop.length.toLong
    val ref = pop.groupBy(_._2).map { case (seg, xs) =>
      val resp = xs.filter(x => orders.contains(x._1))
      val os = resp.map(x => orders(x._1)).sum
      val ybar = os * 1000L / resp.length
      seg -> (xs.length.toLong, resp.length.toLong,
        resp.length * 1000000L / xs.length, ybar,
        xs.length * ybar * 1000L / nTotal)
    }
    val got = ExtensionQueries101.q396_post_stratified(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got == ref)
    // the contributions telescope to a post-stratified estimate close to
    // the naive respondent mean (segments respond near-uniformly here),
    // and every segment has respondents
    val post = got.values.map(_._5).sum
    val naive = orders.values.sum * 1000000L / orders.size
    assert(math.abs(post - naive) * 10 < naive, s"post $post vs naive $naive")
    assert(got.values.forall(_._2 > 0L))
  }
}
