package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries100

/** Semantics pins for the runs/percentile-disc/burstiness batch
  * (q391-q393).
  */
class ExtensionQueries100Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q391: runs test equals the driver sequence recount; revenue reads as noise") {
    val daily = graft.core.Tables.orders(spark, dir)
      .groupBy(expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("r"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val sortedVals = daily.map(_._2).sorted
    val med = sortedVals((sortedVals.length + 1) / 2 - 1)
    val signs = daily.filter(_._2 != med).map(_._2 > med)
    val n = signs.length.toLong
    val n1 = signs.count(identity).toLong
    val rRuns = 1L + signs.sliding(2).count(p => p.length == 2 && p(0) != p(1))
    val a = n1 * (n - n1)
    val b = 2 * a * (2 * a - n)
    val z = (rRuns * n - n - 2 * a) * 1000000L /
      math.sqrt((b * 1000000L / (n - 1)).toDouble).floor.toLong
    val row = ExtensionQueries100.q391_runs_test(spark, dir).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4)) == (n, n1, n - n1, rRuns, z))
    // independent daily draws: the run structure must read as noise
    assert(math.abs(z) < 3000L, s"z_milli = $z")
    // and the run count itself is feasible: between 2 and n
    assert(rRuns >= 2L && rRuns <= n)
  }

  test("q392: percentile_disc picks actual data values matching the driver ranks") {
    val lead = graft.core.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        expr("CAST(datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01') AS BIGINT)").as("sd"))
      .join(graft.core.Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderpriority"),
          expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)").as("od")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"), (col("sd") - col("od")).as("ld"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def disc(xs: Seq[Long], q: Double): Long = {
      val s = xs.sorted
      s(math.ceil(q * s.length).toInt.max(1) - 1)
    }
    val ref = lead.groupBy(_._1).map { case (p, xs) =>
      val v = xs.map(_._2).toSeq
      p -> (v.length.toLong, disc(v, 0.25), disc(v, 0.5), disc(v, 0.9),
        v.sum * 1000 / v.length)
    }
    val got = ExtensionQueries100.q392_leadtime_percentile_disc(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got == ref)
    // discrete percentiles are order statistics: monotone, and (this
    // corpus draws ship and order dates independently) the spread spans
    // a wide band bounded by the calendar
    for ((_, (_, p25, p50, p90, _)) <- got) {
      assert(p25 <= p50 && p50 <= p90)
      assert(p90 - p25 > 0L && p90 - p25 < 3000L)
    }
  }

  test("q393: burstiness equals the driver gap math and spans the B spectrum") {
    val ev = graft.core.Tables.events(spark, dir)
      .select(col("user_id"), expr("ts div 60000000000"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ref = ev.groupBy(_._1).flatMap { case (u, xs) =>
      val ts = xs.sortBy(t => (t._2, t._3)).map(_._2).toSeq
      val d: Seq[Long] = ts.sliding(2).collect { case Seq(x, y) => y - x }.toSeq
      if (d.length < 2) None
      else {
        val k = d.length.toLong
        val (s1, s2) = (d.sum, d.map(x => x * x).sum)
        val mean = s1 * 1000 / k
        val sigma = math.sqrt(((k * s2 - s1 * s1) * 1000000L / (k * k)).toDouble)
          .floor.toLong
        val b = if (sigma + mean == 0) 0L else (sigma - mean) * 1000 / (sigma + mean)
        Some(u -> (k, mean, sigma, b))
      }
    }
    val got = ExtensionQueries100.q393_burstiness(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got == ref.toMap)
    // B is bounded in (-1000, 1000); Poisson-ish arrivals center near 0
    assert(got.values.forall(v => v._4 > -1000L && v._4 < 1000L))
    val meanB = got.values.map(_._4).sum / got.size
    assert(math.abs(meanB) < 500L, s"mean burstiness $meanB")
  }
}
