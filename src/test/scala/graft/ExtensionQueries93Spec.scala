package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries93

/** Semantics pins for the transpose/HBOS/cross-lang batch (q370-q372). */
class ExtensionQueries93Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q370: transpose is the exact matrix flip of the wide aggregate") {
    val wide = graft.core.Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(sum(expr("CAST(round(l_quantity * 100) AS BIGINT)")).as("qty_c"),
        sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("price_c"),
        count(lit(1)).as("n_rows"))
      .collect().map(r => r.getString(0) ->
        Map("qty_c" -> r.getLong(1), "price_c" -> r.getLong(2), "n_rows" -> r.getLong(3)))
      .toMap
    val t = ExtensionQueries93.q370_transpose(spark, dir)
    assert(t.columns.toSeq == Seq("key", "A", "N", "R"))
    val got = t.collect().map(r => r.getString(0) ->
      Seq("A", "N", "R").map(f => f -> r.getLong(t.columns.indexOf(f))).toMap).toMap
    for ((flag, metrics) <- wide; (m, v) <- metrics)
      assert(got(m)(flag) == v, s"cell ($m, $flag)")
    assert(got.keySet == Set("qty_c", "price_c", "n_rows"))
  }

  test("q371: HBOS equals the driver histogram math; top-k hits the rarest bins") {
    val base = graft.core.Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT) div 5000000"),
        col("o_orderpriority"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') % 7 AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    def bits(x: Long): Long = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val n = base.length.toLong
    val hPb = base.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val hPr = base.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val hWd = base.groupBy(_._4).view.mapValues(_.size.toLong).toMap
    val scored = base.map { case (k, pb, pr, wd) =>
      (k, pb, pr, wd,
        3 * bits(n) - bits(hPb(pb)) - bits(hPr(pr)) - bits(hWd(wd)))
    }
    val ref = scored.sortBy(t => (-t._5, t._1)).take(20).zipWithIndex
      .map { case ((k, pb, pr, wd, sc), i) => (i + 1L, k, pb, pr, wd, sc) }
    val got = ExtensionQueries93.q371_hbos(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == ref.toSeq)
    // the top anomaly must sit in a strictly rarer price band than the
    // commonest band (the scorer actually separates density)
    val topBand = ref.head._3
    assert(hPb(topBand) < hPb.values.max, s"top anomaly in a common band: $topBand")
  }

  test("q372: the matrix diagonal is each row's best fit (own model is coolest)") {
    val got = ExtensionQueries93.q372_crosslang_surprisal(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val langs = got.keys.map(_._1).toSet
    assert(langs.size == 5 && got.size == 25)
    // the corpus shares one vocabulary across language tags, so model
    // SIZE dominates across rows (a smaller model has lower smoothed
    // surprisal everywhere) — the honest invariant is WITHIN each
    // model's row: its own corpus fits at least as well as any foreign
    // one (diagonal ≤ off-diagonal, ties allowed)
    for (m <- langs; ev <- langs)
      assert(got((m, m))._3 <= got((m, ev))._3,
        s"model $m fits foreign $ev (${got((m, ev))._3}) better than itself (${got((m, m))._3})")
    // n_tokens per eval language is constant across models (same corpus)
    for (ev <- langs)
      assert(langs.map(m => got((m, ev))._1).size == 1 ||
        langs.map(m => got((m, ev))._1).toSet.size == 1)
  }
}
