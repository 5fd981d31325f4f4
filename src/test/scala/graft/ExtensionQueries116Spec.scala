package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries116

/** Semantics pins for q432-q434 (Burrows' delta, two-sample runs,
  * Kendall's W).
  */
class ExtensionQueries116Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q432: deltas equal the driver stylometry model over the full pair frame") {
    val toks = graft.core.Tables.documents(spark, dir)
      .select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ", -1).map(r.getString(0) -> _))
    val top = toks.groupBy(_._2).toSeq.map { case (t, xs) => (t, xs.length) }
      .sortBy { case (t, n) => (-n, t) }.take(30).map(_._1)
    val nS = toks.groupBy(_._1).map { case (s, xs) => s -> xs.length.toLong }
    val sources = nS.keys.toSeq.sorted
    val cnt = toks.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    def disc(vs: Seq[Long]): Long = { val s = vs.sorted; s((s.size - 1) / 2) }
    val f = (for (s <- sources; t <- top)
      yield (s, t) -> cnt.getOrElse((s, t), 0L) * 1000000 / nS(s)).toMap
    val z = top.flatMap { t =>
      val fs = sources.map(s => f((s, t)))
      val med = disc(fs)
      val mad = disc(fs.map(v => math.abs(v - med)))
      sources.map(s => (s, t) ->
        (if (mad == 0) 0L else (f((s, t)) - med) * 1000 / mad))
    }.toMap
    val expected = (for {
      a <- sources; b <- sources if a < b
    } yield (a, b, top.map(t => math.abs(z((a, t)) - z((b, t)))).sum / top.size))
      .sorted
    val got = ExtensionQueries116.q432_burrows_delta(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(got.size == sources.size * (sources.size - 1) / 2)
  }

  test("q433: runs count equals the sorted-label fold; interleaving reads random") {
    val spend = graft.core.Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT)) div 100").as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val seg = graft.core.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val labels = spend.sortBy { case (ck, v) => (v, ck) }
      .map { case (ck, _) => seg(ck) == "BUILDING" }
    val runs = 1L + labels.sliding(2).count { case Array(a, b) => a != b; case _ => false }
    val m = labels.count(identity).toLong
    val nn = labels.length - m
    val nAll = m + nn
    val d = runs * nAll - 2 * m * nn - nAll
    val expZ2 = (BigInt(d) * d * (nAll - 1) * 1000 /
      (BigInt(2) * m * nn * (2 * m * nn - nAll))).toLong
    val row = ExtensionQueries116.q433_two_sample_runs(spark, dir).collect().head
    assert(row.getLong(0) == runs)
    assert((row.getLong(1), row.getLong(2)) == ((m, nn)))
    assert(row.getLong(3) == expZ2, s"z2 ${row.getLong(3)} != $expZ2")
    // segments are spend-independent: the labels interleave randomly
    // (z² well under the 3.84·1000 5% bar)
    assert(row.getLong(3) < 3840L, s"null design rejected: z2=${row.getLong(3)}")
  }

  test("q434: W equals the driver rank model and sits in [0, 1e6]") {
    val o = graft.core.Tables.orders(spark, dir)
      .select(col("o_custkey"),
        datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")).cast("long").as("day"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val seg = graft.core.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val d0 = o.map(_._2).min
    val cells = o.groupBy(x => (seg(x._1), (x._2 - d0) / 365))
      .map { case (k, xs) => k -> xs.map(_._3).sum }
    val segs = cells.keys.map(_._1).toSeq.distinct.sorted
    val years = cells.keys.map(_._2).toSeq.distinct.sorted
    val (b, k) = (segs.size.toLong, years.size.toLong)
    val rj = scala.collection.mutable.Map(years.map(_ -> 0L): _*)
    for (sg <- segs) {
      val ranked = years.map(y => (y, cells.getOrElse((sg, y), 0L)))
        .sortBy { case (y, rev) => (rev, y) }.zipWithIndex
      for (((y, _), idx) <- ranked) rj(y) += idx + 1L
    }
    val s4 = years.map(y => { val d = 2 * rj(y) - b * (k + 1); d * d }).sum
    val expW = 3 * s4 * 1000000 / (b * b * (k * k * k - k))
    val row = ExtensionQueries116.q434_kendall_w(spark, dir).collect().head
    assert((row.getLong(0), row.getLong(1)) == ((b, k)))
    assert(row.getLong(2) == s4 && row.getLong(3) == expW)
    assert(expW >= 0 && expW <= 1000000)
  }
}
