package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries98

/** Semantics pins for the drift/trend/seasonality batch (q385-q387). */
class ExtensionQueries98Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private lazy val daily: Seq[(Long, Long)] =
    graft.core.Tables.orders(spark, dir)
      .groupBy(expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("r"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq

  test("q385: CvM equals the driver ECDF math; same-vs-same scores ~0") {
    val o = graft.core.Tables.orders(spark, dir)
      .filter(col("o_orderstatus").isin("F", "O"))
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)"),
        (col("o_orderstatus") === "F"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val (s1, s2) = (o.filter(_._2).map(_._1).sorted, o.filterNot(_._2).map(_._1).sorted)
    val (n1, n2) = (s1.length.toLong, s2.length.toLong)
    val pooled = o.map(_._1).distinct.sorted
    var (f1, f2) = (0L, 0L)
    var ssd = BigInt(0)
    val cnts = o.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    for (v <- pooled) {
      f1 += s1.count(_ == v); f2 += s2.count(_ == v)
      val d = BigInt(n2 * f1 - n1 * f2)
      ssd += cnts(v) * d * d
    }
    val expected = (ssd * 1000000 /
      (BigInt(n1 + n2) * (n1 * n2) * (n1 * n2))).toLong
    val row = ExtensionQueries98.q385_cvm_distance(spark, dir).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == (n1, n2, n1 + n2))
    assert(row.getLong(3) == expected)
    // F and O totals are drawn from the same distribution: the
    // whole-curve distance must read near zero (same-vs-same null band)
    assert(row.getLong(3) < 50000L, s"cvm_ppm = ${row.getLong(3)}")
  }

  test("q386: Mann-Kendall equals the driver pair recount; no strong monotone trend") {
    val s = (for {
      i <- daily.indices; j <- daily.indices if i < j
    } yield java.lang.Long.signum(daily(j)._2 - daily(i)._2).toLong).sum
    val n = daily.length.toLong
    val tie18 = daily.groupBy(_._2).values.map(_.size.toLong)
      .map(t => t * (t - 1) * (2 * t + 5)).sum
    val var18 = n * (n - 1) * (2 * n + 5) - tie18
    val z = if (s == 0) 0L
      else java.lang.Long.signum(s) * (math.abs(s) - 1) * 1000000L /
        math.sqrt((var18 * 1000000L / 18).toDouble).floor.toLong
    val row = ExtensionQueries98.q386_mann_kendall(spark, dir).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ==
      (n, s, var18, z))
    // stationary synthetic revenue: |z| must sit inside +-3 (milli 3000)
    assert(math.abs(z) < 3000L, s"z_milli = $z")
  }

  test("q387: eta-squared equals the driver decomposition; weekday explains little") {
    val days = daily.map { case (d, c) => (d % 7, c / 100) }
    val n = days.length.toLong
    val s1 = days.map(_._2).sum
    val s2 = days.map(x => BigInt(x._2) * x._2).sum
    val groups = days.groupBy(_._1).map { case (w, xs) =>
      (xs.length.toLong, xs.map(_._2).sum) }
    val num = groups.map { case (ng, sg) =>
      val e = (n * sg - ng * s1) / ng
      BigInt(ng) * e * e
    }.sum
    val eta2 = (num * 1000000 / (BigInt(n) * (n * s2 - BigInt(s1) * s1))).toLong
    val row = ExtensionQueries98.q387_weekday_eta2(spark, dir).collect().head
    assert(row.getLong(0) == n && row.getLong(1) == s1 / n)
    assert(row.getLong(2) == eta2)
    // synthetic orders have no weekday cycle: eta^2 stays under 2% but
    // is not identically zero (finite-sample between-group variance)
    assert(eta2 > 0L && eta2 < 20000L, s"eta2_ppm = $eta2")
  }
}
