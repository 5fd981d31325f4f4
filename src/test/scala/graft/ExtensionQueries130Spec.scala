package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries130

/** Driver-model pins for q480-q483 (exact median CI, Wilks tolerance,
  * Kaplan-Meier + Nelson-Aalen, RMST): recomputed from collected
  * sf0.001 rows in plain Scala + BigInt with the same rank, fold, and
  * truncation conventions.
  */
class ExtensionQueries130Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def daily(): Seq[(Long, Long)] =
    graft.core.Tables.events(spark, dir)
      .groupBy(expr("ts div 1000 div 86400000000").as("day"))
      .agg(count(lit(1)).as("n_ev"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)

  private def binom(m: Long, j: Long): Long =
    (1L to j).foldLeft(1L)((acc, t) => acc * (m - t + 1) / t)

  test("q480: the chosen rank pair and coverage match the brute model") {
    val d = daily()
    val n = d.length.toLong
    val sorted = d.sortBy(x => (x._2, x._1)).map(_._2)
    val covOf = (l: Long) => {
      val lower = (0L until l).map(binom(n, _)).sum
      ((1L << n.toInt) - 2 * lower) * 1000000L / (1L << n.toInt)
    }
    val l = (1L to (n + 1) / 2).filter(covOf(_) >= 950000L).max
    val g = ExtensionQueries130.q480_median_exact_ci(spark, dir).collect().head
    assert((g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3), g.getLong(4)) ==
      ((n, l, covOf(l), sorted((l - 1).toInt), sorted((n - l).toInt))))
    // interval must be non-degenerate and ordered
    assert(g.getLong(3) <= g.getLong(4))
  }

  test("q481: Wilks confidence matches the brute rational model") {
    val d = daily()
    val n = d.length
    val p10 = BigInt(10).pow(n)
    val p9n1 = BigInt(9).pow(n - 1)
    val p9n = BigInt(9).pow(n)
    val conf = ((p10 - 10 * n * p9n1 + (n - 1) * p9n) * 1000000 / p10).toLong
    val g = ExtensionQueries130.q481_wilks_tolerance(spark, dir).collect().head
    assert((g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3), g.getLong(4)) ==
      ((n.toLong, 90L, conf, d.map(_._2).min, d.map(_._2).max)))
    // n = 30 at p = 0.9 sits around 80% confidence — pin the ballpark
    assert(conf > 500000L && conf < 999000L)
  }

  private def kmCurve(): (Seq[(Long, Long, Long, Long)], Seq[(Long, Long)]) = {
    // returns (rows of (t, n_risk, d, c), km steps (t, survival_ppm))
    val ev = graft.core.Tables.events(spark, dir)
      .select(col("user_id"), expr("ts div 1000 div 86400000000").as("day"),
        (col("event_type") === "purchase").as("pur"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val maxDay = ev.map(_._2).max
    val perUser = ev.groupBy(_._1).values.map { xs =>
      val origin = xs.map(_._2).min
      val pday = xs.filter(_._3).map(_._2).minOption
      (pday.map(_ - origin).getOrElse(maxDay - origin), pday.isDefined)
    }.toSeq
    val perT = perUser.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, xs) =>
      (t, xs.count(_._2).toLong, xs.count(!_._2).toLong)
    }
    val rows = perT.map { case (t, dd, cc) =>
      val nRisk = perT.filter(_._1 >= t).map(x => x._2 + x._3).sum
      (t, nRisk, dd, cc)
    }
    var acc = 1000000L
    val km = rows.map { case (t, nr, dd, _) =>
      acc = acc * (nr - dd) / nr; (t, acc)
    }
    (rows, km)
  }

  test("q482: KM and NA columns equal the brute in-order fold") {
    val (rows, km) = kmCurve()
    val naAt = rows.map { case (t, nr, dd, _) => (t, dd * 1000000L / nr) }
    val expected = rows.zipWithIndex.map { case ((t, nr, dd, cc), i) =>
      (t, nr, dd, cc, km(i)._2, naAt.take(i + 1).map(_._2).sum)
    }
    val got = ExtensionQueries130.q482_kaplan_meier(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    // the curve must actually decrease (purchases happen)
    assert(km.last._2 < 1000000L)
  }

  test("q483: RMST and median survival equal the brute step integral") {
    val (_, km) = kmCurve()
    val widths = km.zipWithIndex.map { case ((t, s), i) =>
      val w = if (i + 1 < km.length) km(i + 1)._1 - t else 1L
      (t, s, w)
    }
    val rmst = km.head._1 * 1000000L + widths.map(x => x._2 * x._3).sum
    val median = km.find(_._2 <= 500000L).map(_._1)
    val g = ExtensionQueries130.q483_rmst(spark, dir).collect().head
    assert((g.getLong(0), g.getLong(1),
      if (g.isNullAt(2)) None else Some(g.getLong(2))) ==
      ((km.last._1, rmst, median)))
  }
}
