package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries99

/** Semantics pins for the listagg/hazard/peaks batch (q388-q390). */
class ExtensionQueries99Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q388: ordered listagg equals the driver top-5 join") {
    val c = graft.core.Tables.customer(spark, dir)
      .select(col("c_mktsegment"), col("c_custkey"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val ref = c.groupBy(_._1).map { case (seg, xs) =>
      seg -> (xs.length.toLong,
        xs.sortBy(t => (-t._3, t._2)).take(5).map(_._2).mkString(","))
    }
    val got = ExtensionQueries99.q388_listagg(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got == ref)
    assert(got.values.forall(_._2.split(",").length == 5))
  }

  test("q389: hazard table equals the driver span recount; identities hold") {
    val spans = graft.core.Tables.events(spark, dir)
      .select(col("user_id"), expr("ts div 604800000000000")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (_, xs) =>
        xs.map(_._2).max - xs.map(_._2).min }
    val maxK = spans.max
    val ref = (0L to maxK).map { k =>
      val atRisk = spans.count(_ >= k).toLong
      val ch = spans.count(_ == k).toLong
      k -> (atRisk, ch, ch * 1000000L / atRisk)
    }.toMap
    val got = ExtensionQueries99.q389_hazard_table(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == ref)
    // at-risk counts are non-increasing; everyone churns somewhere:
    // churned sums to the user count; the last row's hazard is 1e6
    assert(got.toSeq.sortBy(_._1).map(_._2._1).sliding(2)
      .forall(p => p.length < 2 || p(0) >= p(1)))
    assert(got.values.map(_._2).sum == spans.size.toLong)
    assert(got(maxK)._3 == 1000000L)
  }

  test("q390: peaks equal the driver window recount and truly dominate their window") {
    val daily = graft.core.Tables.orders(spark, dir)
      .groupBy(expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("r"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val byDay = daily.toMap
    val ref = daily.flatMap { case (d, r) =>
      val nbrs = (d - 3 to d + 3).filter(x => x != d && byDay.contains(x)).map(byDay)
      if (nbrs.isEmpty) None
      else {
        val nbr = nbrs.max
        if (r * 20 > nbr * 21)
          Some((d, r, nbr, (r - nbr) * 1000000L / nbr))
        else None
      }
    }
    val got = ExtensionQueries99.q390_local_peaks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == ref.toSeq)
    // a peak beats EVERY in-window neighbor by >= 5%
    assert(got.forall { case (_, r, nbr, m) => r * 20 > nbr * 21 && m >= 47619L })
    assert(got.nonEmpty, "sparse sf0.001 revenue has spiky days by construction")
  }
}
