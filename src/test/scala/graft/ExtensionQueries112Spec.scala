package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries112

/** Semantics pins for q423-q425 (Jonckheere, shard planning,
  * regression to the mean).
  */
class ExtensionQueries112Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q423: JT equals the direct pairwise count; spend trends with activity") {
    val cust = graft.core.Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"),
        expr("sum(CAST(round(o_totalprice * 100) AS BIGINT)) div 100").as("v"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
      .map { case (n, v) => (if (n <= 4) 0 else if (n <= 8) 1 else 2, v) }
    val gs = (0 to 2).map(g => cust.filter(_._1 == g).map(_._2))
    // direct O(m·n) pairwise 2U for each ordered pair
    def u2(lo: Seq[Long], hi: Seq[Long]): Long =
      (for (x <- lo; y <- hi) yield if (y > x) 2L else if (y == x) 1L else 0L).sum
    val jt2 = u2(gs(0), gs(1)) + u2(gs(0), gs(2)) + u2(gs(1), gs(2))
    val n = cust.size.toLong
    val ns = gs.map(_.size.toLong)
    val d2 = jt2 - (n * n - ns.map(x => x * x).sum) / 2
    val denom = BigInt(n) * n * (2 * n + 3) -
      ns.map(x => BigInt(x) * x * (2 * x + 3)).sum
    val expZ2 = (18000 * BigInt(d2) * d2 / denom).toLong
    val row = ExtensionQueries112.q423_jonckheere(spark, dir).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((ns(0), ns(1), ns(2))))
    assert(row.getLong(3) == jt2 / 2, s"jt ${row.getLong(3)} != ${jt2 / 2}")
    assert(row.getLong(4) == expZ2)
    // more orders ⇒ more spend: the ordered trend must be strongly
    // significant (z² ≫ the 3.84 one-sided 5% bar)
    assert(row.getLong(4) > 10000L, s"z2_milli ${row.getLong(4)} not significant")
  }

  test("q424: shards partition the corpus; every doc lands in its prefix shard") {
    val docs = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var cum = 0L
    val assign = docs.map { case (id, t) =>
      val shard = cum / 2000; cum += t; (shard, id, t) }
    val expected = assign.groupBy(_._1).toSeq.sortBy(_._1).map { case (sh, xs) =>
      (sh, xs.length.toLong, xs.map(_._3).sum, xs.map(_._2).min, xs.map(_._2).max)
    }
    val got = ExtensionQueries112.q424_shard_plan(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == expected)
    // partition: doc counts and tokens must cover the corpus exactly
    assert(got.map(_._2).sum == docs.length.toLong)
    assert(got.map(_._3).sum == docs.map(_._2).sum)
    // every non-final shard holds at least its budget's worth of starts
    got.dropRight(1).foreach { case (_, _, toks, _, _) => assert(toks >= 2000L - 200L) }
  }

  test("q425: deciles shrink toward the middle (the winner's curse is visible)") {
    val rows = ExtensionQueries112.q425_regression_to_mean(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(rows.keySet == Set("bottom_decile", "top_decile"))
    val (_, top1, top2, topShrink) = rows("top_decile")
    val (_, bot1, bot2, botShrink) = rows("bottom_decile")
    // construction: top decile mean pr1 ≈ 950k, bottom ≈ 50k
    assert(top1 > 900000L && bot1 < 100000L)
    assert(topShrink == top1 - top2 && botShrink == bot1 - bot2)
    // spend halves are positively but imperfectly correlated: winners
    // regress DOWN (shrink > 0), losers regress UP (shrink < 0)
    assert(topShrink > 0L, s"top cohort did not regress: $topShrink")
    assert(botShrink < 0L, s"bottom cohort did not regress: $botShrink")
  }
}
