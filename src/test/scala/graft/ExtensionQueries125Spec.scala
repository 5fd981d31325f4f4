package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries125

/** Driver-model pins for q460-q463 (Pettitt change point, average
  * precision, Doksum shift deciles, weekday-adjusted anomalies):
  * recomputed from collected sf0.001 rows in plain Scala with the same
  * rank, sign, and truncation conventions.
  */
class ExtensionQueries125Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private val funcWords = Set("the", "of", "and", "to", "in", "a", "is", "that", "it", "for")

  private def daily(): Seq[(Long, Long)] =
    graft.core.Tables.events(spark, dir)
      .groupBy(expr("ts div 1000 div 86400000000").as("day"))
      .agg(count(lit(1)).as("n_ev"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)

  private def series(tpe: String): Seq[(Long, Long)] =
    graft.core.Tables.events(spark, dir)
      .filter(col("event_type") === tpe)
      .groupBy(expr("ts div 1000 div 86400000000").as("day"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)

  test("q460: Pettitt change day equals the brute max-|U| split") {
    val d = daily()
    val us = d.map(_._1).dropRight(1).map { k =>
      val (le, gt) = d.partition(_._1 <= k)
      val u = (for (a <- le; b <- gt)
        yield java.lang.Long.signum(a._2 - b._2).toLong).sum
      (k, u)
    }
    val best = us.minBy { case (k, u) => (-math.abs(u), k) }
    val g = ExtensionQueries125.q460_pettitt_changepoint(spark, dir).collect().head
    assert((g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3)) ==
      ((d.length.toLong, best._1, best._2, math.abs(best._2))))
  }

  test("q461: exact AP equals the brute precision-at-positive-ranks model") {
    val docs = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang")).collect()
      .map { r =>
        val ts = r.getString(1).split(" ", -1)
        (r.getLong(0), ts.count(funcWords).toLong * 1000000L / ts.length,
          r.getString(2) == "en")
      }
    val ranked = docs.sortBy(d => (-d._2, d._1))
    var cum = 0L
    val pAtK = ranked.zipWithIndex.flatMap { case ((_, _, pos), i) =>
      if (pos) { cum += 1; Some(cum * 1000000L / (i + 1)) } else None
    }
    val nPos = pAtK.length.toLong
    val g = ExtensionQueries125.q461_average_precision(spark, dir).collect().head
    assert((g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3)) ==
      ((docs.length.toLong, nPos, nPos * 1000000L / docs.length,
        pAtK.sum / nPos)))
    // AP is a probability-scaled ppm; on this synthetic corpus the crude
    // ranking sits NEAR prevalence (no strong signal) — pin the range,
    // not informativeness
    assert(g.getLong(3) > 0L && g.getLong(3) <= 1000000L)
  }

  test("q462: decile shift function equals the brute quantile model") {
    val x = series("view").sortBy(v => (v._2, v._1)).map(_._2)
    val y = series("click").sortBy(v => (v._2, v._1)).map(_._2)
    def quant(v: Seq[Long], q: Long): Long = v(((q * v.length + 9) / 10 - 1).toInt)
    val expected = (1L to 9L).map(q =>
      (q, quant(x, q), quant(y, q), quant(y, q) - quant(x, q)))
    val got = ExtensionQueries125.q462_quantile_shift(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("q463: anomaly flags equal the brute weekday-mean + MAD model") {
    val d = daily().map { case (day, n) => (day, (day + 4) % 7, n) }
    val dowMean = d.groupBy(_._2).view
      .mapValues(xs => xs.map(_._3).sum / xs.length).toMap
    val resid = d.map { case (day, dow, n) => (day, dow, n, n - dowMean(dow)) }
    val sortedAbs = resid.map(r => (math.abs(r._4), r._1)).sorted.map(_._1)
    val mad = sortedAbs(((resid.length + 1) / 2 - 1).toInt)
    val expected = resid.sortBy(_._1).map { case (day, dow, n, r) =>
      (day, dow, n, r, mad, math.abs(r) * 1000 > mad * 4448)
    }
    val got = ExtensionQueries125.q463_weekday_anomalies(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSeq
    assert(got == expected)
  }
}
