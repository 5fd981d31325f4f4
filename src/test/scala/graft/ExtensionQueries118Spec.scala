package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries118

/** Driver-model pins for q436-q439 (chi-square/Cramér, Mood's median,
  * γ/Somers' d, Cox–Stuart): every statistic recomputed from first
  * principles on collected sf0.001 rows with BigInt arithmetic and the
  * same per-cell truncation conventions, then compared exactly.
  */
class ExtensionQueries118Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def orders = graft.core.Tables.orders(spark, dir)
  private def customer = graft.core.Tables.customer(spark, dir)

  test("q436: chi2/V2 equal the BigInt contingency model") {
    val segOf = customer.select(col("c_custkey"), col("c_mktsegment"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val obs = orders.select(col("o_custkey"), col("o_orderpriority")).collect()
      .map(r => (segOf(r.getLong(0)), r.getString(1)))
    val segs = obs.map(_._1).distinct.sorted
    val prios = obs.map(_._2).distinct.sorted
    val cnt = obs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = BigInt(obs.length)
    val rT = segs.map(s => s -> BigInt(prios.map(p => cnt.getOrElse((s, p), 0L)).sum)).toMap
    val cT = prios.map(p => p -> BigInt(segs.map(s => cnt.getOrElse((s, p), 0L)).sum)).toMap
    val chi2 = (for (s <- segs; p <- prios) yield {
      val dev = BigInt(cnt.getOrElse((s, p), 0L)) * n - rT(s) * cT(p)
      dev * dev * 1000 / (n * rT(s) * cT(p))
    }).sum
    val v2 = chi2 * 1000 / (n * (math.min(segs.size, prios.size) - 1))
    val row = ExtensionQueries118.q436_chi_square_independence(spark, dir).collect().head
    assert(row.getAs[Long]("n_orders") == obs.length.toLong)
    assert(row.getAs[Long]("chi2_milli") == chi2.toLong)
    assert(row.getAs[Long]("cramer_v2_ppm") == v2.toLong)
  }

  test("q437: Mood chi2 equals the BigInt 2xk model with the discrete pooled median") {
    val segOf = customer.select(col("c_custkey"), col("c_mktsegment"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val sp = orders.groupBy(col("o_custkey"))
      .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT)) div 100").as("v"))
      .collect().map(r => (segOf(r.getLong(0)), r.getLong(1)))
    val vs = sp.map(_._2).sorted
    val med = vs((math.ceil(0.5 * vs.length) - 1).toInt) // percentile_disc(0.5)
    val segs = sp.map(_._1).distinct.sorted
    val cnt = sp.groupBy { case (s, v) => (s, v > med) }
      .view.mapValues(_.length.toLong).toMap
    val n = BigInt(sp.length)
    val rT = segs.map(s => s -> BigInt(cnt.getOrElse((s, true), 0L) + cnt.getOrElse((s, false), 0L))).toMap
    val cT = Seq(true, false).map(a => a -> BigInt(segs.map(s => cnt.getOrElse((s, a), 0L)).sum)).toMap
    val chi2 = (for (s <- segs; a <- Seq(true, false)) yield {
      val dev = BigInt(cnt.getOrElse((s, a), 0L)) * n - rT(s) * cT(a)
      dev * dev * 1000 / (n * rT(s) * cT(a))
    }).sum
    val row = ExtensionQueries118.q437_mood_median_test(spark, dir).collect().head
    assert(row.getAs[Long]("median_spend") == med)
    assert(row.getAs[Long]("n_customers") == sp.length.toLong)
    assert(row.getAs[Long]("chi2_milli") == chi2.toLong)
  }

  test("q438: gamma and Somers' d equal the brute unordered-pair scan") {
    val width = graft.core.Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("w")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val xy = orders.select(col("o_orderkey"), col("o_orderpriority")).collect()
      .flatMap { r =>
        width.get(r.getLong(0)).map(w => (r.getString(1).take(1).toLong, w))
      }
    var c = BigInt(0); var d = BigInt(0); var ty = BigInt(0)
    for (i <- xy.indices; j <- (i + 1) until xy.length) {
      val ((x1, y1), (x2, y2)) = (xy(i), xy(j))
      val (sx, sy) = ((x2 - x1).sign, (y2 - y1).sign)
      if (sx != 0 && sy != 0) { if (sx == sy) c += 1 else d += 1 }
      else if (sy == 0 && sx != 0) ty += 1
    }
    val row = ExtensionQueries118.q438_ordinal_association(spark, dir).collect().head
    assert(row.getAs[Long]("n_concordant") == c.toLong)
    assert(row.getAs[Long]("n_discordant") == d.toLong)
    assert(row.getAs[Long]("n_tied_y_only") == ty.toLong)
    assert(row.getAs[Long]("gamma_ppm") == ((c - d) * 1000000 / (c + d)).toLong)
    assert(row.getAs[Long]("somers_d_ppm") == ((c - d) * 1000000 / (c + d + ty)).toLong)
  }

  test("q439: Cox-Stuart pairs/tail equal the BigInt binomial model") {
    val daily = graft.core.Tables.events(spark, dir)
      .groupBy(expr("ts div 1000 div 86400000000").as("day"))
      .agg(count(lit(1)).as("n_ev")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val d0 = daily.head._1
    val h = (daily.length + 1) / 2
    val byI = daily.map { case (day, c) => (day - d0) -> c }.toMap
    val pairs = byI.toSeq.flatMap { case (i, x) =>
      byI.get(i + h).map(y => (x, y))
    }.filter { case (x, y) => x != y }
    val n = pairs.length
    val s = pairs.count { case (x, y) => y > x }
    def binom(n: Int, k: Int): BigInt =
      (1 to k).foldLeft(BigInt(1))((a, i) => a * (n - i + 1) / i)
    val tail = (0 to math.min(s, n - s)).map(binom(n, _)).sum
    val p = (BigInt(2) * tail * 1000000 / (BigInt(1) << n)).min(1000000)
    val row = ExtensionQueries118.q439_cox_stuart_trend(spark, dir).collect().head
    assert(row.getAs[Long]("n_pairs") == n.toLong)
    assert(row.getAs[Long]("n_up") == s.toLong)
    assert(row.getAs[Long]("tail_sum") == tail.toLong)
    assert(row.getAs[Long]("p_ppm") == p.toLong)
    // the events table spans ~30 days -> a real pairing, not an empty frame
    assert(n >= 10, s"expected a meaningful Cox-Stuart pairing, got n=$n")
  }
}
