package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries97

/** Semantics pins for the eval-loop batch (q382-q384). */
class ExtensionQueries97Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q382: P/R/F1 equal the driver pair recount; the dedup actually scores well") {
    val cl = graft.queries.ExtensionQueries2.q42ClustersStaged(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def pairSum(groups: Iterable[Int]): Long =
      groups.map(c => c.toLong * (c - 1) / 2).sum
    val tp = pairSum(cl.groupBy(t => (t._2, t._1 % 100000)).values.map(_.length))
    val pred = pairSum(cl.groupBy(_._2).values.map(_.length))
    val tru = pairSum(cl.groupBy(_._1 % 100000).values.map(_.length))
    val row = ExtensionQueries97.q382_dedup_pair_quality(spark, dir).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ==
      (cl.length.toLong, tp, pred, tru))
    assert(row.getLong(4) == tp * 1000000L / pred)
    assert(row.getLong(5) == tp * 1000000L / tru)
    assert(row.getLong(6) == 2 * tp * 1000000L / (pred + tru))
    // the planted families are near-dups BY CONSTRUCTION: the shingle
    // clustering must recover most true pairs at high precision
    assert(row.getLong(4) > 800000L, s"precision ${row.getLong(4)} ppm")
    assert(row.getLong(5) > 500000L, s"recall ${row.getLong(5)} ppm")
  }

  test("q383: McNemar equals the driver confusion recount; identities hold") {
    val o = graft.core.Tables.orders(spark, dir)
      .select((col("o_orderstatus") === "F"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT) >= 15000000"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)"))
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1), r.getLong(2)))
    val (d0, d1) = (o.map(_._3).min, o.map(_._3).max)
    val dSplit = d0 + (d1 - d0) / 2
    val rows = o.map { case (y, pa, day) => (y, pa, day <= dSplit) }
    val b = rows.count { case (y, pa, pb) => pa == y && pb != y }.toLong
    val c = rows.count { case (y, pa, pb) => pa != y && pb == y }.toLong
    val row = ExtensionQueries97.q383_mcnemar(spark, dir).collect().head
    assert(row.getLong(0) == rows.length.toLong)
    assert(row.getLong(1) == rows.count(t => t._2 == t._1).toLong)
    assert(row.getLong(2) == rows.count(t => t._3 == t._1).toLong)
    assert((row.getLong(3), row.getLong(4)) == (b, c))
    assert(row.getLong(5) == (b - c) * (b - c) * 1000L / (b + c))
    // accuracy difference decomposes onto the discordant cells exactly
    assert(row.getLong(1) - row.getLong(2) == b - c)
  }

  test("q384: required n equals the driver formula; the small strata are infeasible") {
    val agg = graft.core.Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("k"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ref = agg.map { case (p, (n, k)) =>
      val pp = k * 1000000L / n
      val req = (BigInt(2801600) * 2801600 * 2 * (pp * (1000000 - pp)) /
        (BigInt("1000000000000") * 20000 * 20000)).toLong + 1
      p -> (n, pp, req, if (n >= 2 * req) 1L else 0L)
    }
    val got = ExtensionQueries97.q384_power_analysis(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == ref)
    // a ~300-row stratum cannot power a 2-pp test on a mid-range p: every
    // stratum here must read infeasible, and the formula must demand
    // thousands per arm (the p(1-p) scale sanity)
    assert(got.values.forall(_._4 == 0L), s"sf0.001 strata claimed feasible: $got")
    assert(got.values.forall(v => v._3 > 1000L && v._3 < 100000L))
  }
}
