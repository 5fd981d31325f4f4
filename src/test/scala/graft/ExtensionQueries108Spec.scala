package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries108

/** Semantics pins for q410-q412 (records, exact rank percentiles,
  * Brown–Forsythe).
  */
class ExtensionQueries108Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def daily(): Seq[(Long, Long)] =
    graft.core.Tables.orders(spark, dir)
      .groupBy(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("day"))
      .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT)) div 100").as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)

  private def spendBySeg(): Seq[(String, Long, Long)] = {
    val spend = graft.core.Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT)) div 100").as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val seg = graft.core.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    spend.map { case (ck, v) => (seg(ck), ck, v) }.toSeq
  }

  test("q410: records equal the running-max fold; gaps chain correctly") {
    val d = daily()
    var best = Long.MinValue
    val recs = d.filter { case (_, x) =>
      val isRec = x > best; if (isRec) best = x; isRec }
    val got = ExtensionQueries108.q410_record_days(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(g => (g._1, g._2)).toSeq == recs)
    // each next_record_day is the following record; the last is -1
    got.sliding(2).foreach {
      case Array(a, b) => assert(a._3 == b._1 && a._4 == b._1 - a._1)
      case _ => ()
    }
    assert(got.last._3 == -1L && got.last._4 == -1L)
    // the first day of the series is always a record
    assert(got.head._1 == d.head._1)
  }

  test("q411: ppm percentiles equal the sorted-frame definition for every segment") {
    val data = spendBySeg()
    val got = ExtensionQueries108.q411_percent_rank_ppm(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length == data.size)
    val bySeg = data.groupBy(_._1)
    val lookup = got.map(g => (g._2, g._1) -> g).toMap
    for ((seg, xs) <- bySeg) {
      val vs = xs.map(_._3).sorted
      val n = vs.size.toLong
      for ((_, ck, v) <- xs) {
        val r = vs.indexWhere(_ == v) + 1L        // rank: 1 + #strictly-below
        val le = vs.count(_ <= v).toLong          // cume numerator
        val (_, _, sv, pr, cume) = lookup((seg, ck))
        assert(sv == v)
        assert(pr == (if (n == 1) 0L else (r - 1) * 1000000 / (n - 1)))
        assert(cume == le * 1000000 / n)
      }
    }
  }

  test("q412: F equals the driver median-deviation model; segments read homoscedastic") {
    val data = spendBySeg()
    val bySeg = data.groupBy(_._1)
    def medianDisc(vs: Seq[Long]): Long = {
      val s = vs.sorted
      s((s.size - 1) / 2) // smallest value with CDF >= 0.5
    }
    val z = data.map { case (seg, _, v) =>
      seg -> math.abs(v - medianDisc(bySeg(seg).map(_._3))) }
    val n = z.size.toLong
    val s1 = z.map(_._2).sum
    val s2 = z.map(x => BigInt(x._2) * x._2).sum
    // .toSeq BEFORE .map: a Map mapped to (size, sum) pairs re-keys by
    // size and collapses equal-sized groups
    val groups = z.groupBy(_._1).toSeq.map { case (_, xs) =>
      (xs.size.toLong, xs.map(_._2).sum) }
    val k = groups.size.toLong
    val ssbN2 = groups.map { case (ng, sg) =>
      val e = (n * sg - ng * s1) / ng
      BigInt(ng) * e * e
    }.sum
    val expF = ((n - k) * ssbN2 * 1000 /
      ((k - 1) * (BigInt(n) * (n * s2 - BigInt(s1) * s1) - ssbN2))).toLong
    val row = ExtensionQueries108.q412_brown_forsythe(spark, dir).collect().head
    assert(row.getLong(0) == n && row.getLong(1) == k)
    assert(row.getLong(2) == expF, s"f_milli ${row.getLong(2)} != $expF")
    // segments are assigned independently of spend: F should sit near its
    // null expectation (≈1), far below any rejection region
    assert(row.getLong(2) < 5000L)
  }
}
