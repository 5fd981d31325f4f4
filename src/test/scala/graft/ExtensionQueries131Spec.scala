package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries131

/** Driver-model pins for q484-q487 (Durbin-Watson, seasonal MK, Bowker,
  * exact permutation test): recomputed from collected sf0.001 rows in
  * plain Scala + BigInt with the same residual, season, cell, and mask
  * conventions.
  */
class ExtensionQueries131Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def daily(): Seq[(Long, Long)] =
    graft.core.Tables.events(spark, dir)
      .groupBy(expr("ts div 1000 div 86400000000").as("day"))
      .agg(count(lit(1)).as("n_ev"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)

  test("q484: DW on weekday residuals matches the brute model") {
    val d = daily().map { case (day, n) => (day, (day + 4) % 7, n) }
    val dm = d.groupBy(_._2).view.mapValues(xs => xs.map(_._3).sum / xs.length).toMap
    val resid = d.map { case (day, dow, n) => (day, n - dm(dow)) }
    val byDay = resid.toMap
    val num = resid.flatMap { case (day, e) =>
      byDay.get(day + 1).map(e2 => BigInt(e2 - e) * (e2 - e))
    }.sum
    val sse = resid.map(r => BigInt(r._2) * r._2).sum
    val g = ExtensionQueries131.q484_durbin_watson(spark, dir).collect().head
    assert((g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3)) ==
      ((d.length.toLong, sse.toLong, num.toLong, (num * 1000 / sse).toLong)))
  }

  test("q485: seasonal MK statistic and variance match the brute model") {
    val d = daily().map { case (day, n) => ((day + 4) % 7, day, n) }
    val s = d.groupBy(_._1).values.map { xs =>
      val sorted = xs.sortBy(_._2)
      (for (i <- sorted.indices; j <- (i + 1) until sorted.length)
        yield java.lang.Long.signum(sorted(j)._3 - sorted(i)._3).toLong).sum
    }.sum
    val varX18 = d.groupBy(_._1).values.map { xs =>
      val n = xs.length.toLong; n * (n - 1) * (2 * n + 5)
    }.sum
    val g = ExtensionQueries131.q485_seasonal_mann_kendall(spark, dir).collect().head
    assert((g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3)) ==
      ((d.length.toLong, d.map(_._1).distinct.length.toLong, s, varX18)))
  }

  test("q486: Bowker chi-square matches the brute 5x5 symmetry model") {
    val bands = graft.core.Tables.documents(spark, dir)
      .select(col("text")).collect()
      .map { r =>
        val ts = r.getString(0).split(" ", -1)
        (math.min(4L, ts.length.toLong / 15), math.min(4L, ts.distinct.length.toLong / 15))
      }
    val o = bands.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cells = for {
      i <- 0L to 4L; j <- (i + 1) to 4L
      nij = o.getOrElse((i, j), 0L); nji = o.getOrElse((j, i), 0L)
      if nij + nji > 0
    } yield (nij - nji) * (nij - nji) * 1000L / (nij + nji)
    val g = ExtensionQueries131.q486_bowker_symmetry(spark, dir).collect().head
    assert((g.getLong(0), g.getLong(1), g.getLong(2)) ==
      ((bands.length.toLong, cells.length.toLong, cells.sum)))
  }

  test("q487: enumerated permutation p matches the brute model") {
    val xs = daily().take(12).map(_._2)
    val dObs = xs.zipWithIndex.map { case (x, i) => if (i % 2 == 0) x else -x }.sum
    val dms = (0 until 4096).filter(m => Integer.bitCount(m) == 6).map { m =>
      xs.zipWithIndex.map { case (x, i) =>
        if (((m >> i) & 1) == 1) x else -x
      }.sum
    }
    val extreme = dms.count(dm => math.abs(dm) >= math.abs(dObs)).toLong
    val g = ExtensionQueries131.q487_permutation_test(spark, dir).collect().head
    assert((g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3), g.getLong(4)) ==
      ((12L, dObs, 924L, extreme, extreme * 1000000L / 924L)))
    // the observed split is one of the enumerated ones, so p >= 1/924
    assert(g.getLong(4) >= 1000000L / 924L)
  }
}
