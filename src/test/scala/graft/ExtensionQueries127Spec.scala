package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries127

/** Driver-model pins for q468-q471 (Mantel-Haenszel, session-gap
  * sweep, in-batch collisions, weighted kappa): recomputed from
  * collected sf0.001 rows in plain Scala + BigInt with the same
  * stratification, window, hash, and truncation conventions.
  */
class ExtensionQueries127Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def events(): Seq[(String, Long, Long, Long, Long)] =
    graft.core.Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"), col("event_id"),
        expr("ts div 1000").as("t_us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq

  test("q468: per-stratum and MH odds ratios match the brute model") {
    val ev = events()
    val strata = ev.groupBy(_._1).toSeq.sortBy(_._1)
    val cells = strata.map { case (tpe, xs) =>
      val nT = xs.length.toLong
      val total = xs.map(_._5).sum
      def wk(t: Long) = Set(0L, 6L)((t / 86400000000L + 4) % 7)
      val a = xs.count(x => wk(x._4) && x._5 * nT > total).toLong
      val b = xs.count(x => wk(x._4) && !(x._5 * nT > total)).toLong
      val c = xs.count(x => !wk(x._4) && x._5 * nT > total).toLong
      val d = xs.count(x => !wk(x._4) && !(x._5 * nT > total)).toLong
      (tpe, a, b, c, d, nT)
    }
    val num = cells.map { case (_, a, _, _, d, n) => BigInt(a) * d * 1000000 / n }.map(_.toLong).sum
    val den = cells.map { case (_, _, b, c, _, n) => BigInt(b) * c * 1000000 / n }.map(_.toLong).sum
    val mh = num * 1000L / den
    val expected = cells.map { case (tpe, a, b, c, d, _) =>
      val or = if (b == 0 || c == 0) None
        else Some((BigInt(a) * d * 1000 / (BigInt(b) * c)).toLong)
      (tpe, a, b, c, d, or, mh)
    }
    val got = ExtensionQueries127.q468_mantel_haenszel(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5)),
        r.getLong(6))).toSeq
    assert(got == expected)
  }

  test("q469: session counts per gap threshold match the brute sweep") {
    val ev = events()
    val byUser = ev.groupBy(_._2).view
      .mapValues(_.map(x => (x._4, x._3)).sorted.map(_._1)).toMap
    val nUsers = byUser.size.toLong
    val nEvents = ev.length.toLong
    val expected = Seq(300L, 900L, 1800L, 3600L).map { t =>
      val sessions = byUser.values.map { ts =>
        1L + ts.sliding(2).count(w => w.length == 2 && w(1) - w(0) > t * 1000000L)
      }.sum
      (t, nUsers, sessions, nEvents * 1000L / sessions)
    }
    val got = ExtensionQueries127.q469_session_gap_sweep(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // more sessions at tighter gaps
    assert(expected.head._3 >= expected.last._3)
  }

  test("q470: collision rates per bucket count match the brute model") {
    val docs = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val expected = Seq(8L, 32L, 128L).map { nb =>
      val byBucket = docs.groupBy(d => ((d._1 * 1103515245L + 12345L) % 2147483648L) % nb)
      val pairs = byBucket.values.map(v => BigInt(v.size) * (v.size - 1) / 2).map(_.toLong).sum
      val same = byBucket.values.flatMap(_.groupBy(_._2).values)
        .map(v => BigInt(v.size) * (v.size - 1) / 2).map(_.toLong).sum
      val multi = byBucket.values.count(_.size >= 2).toLong
      (nb, multi, pairs, same, same * 1000000L / pairs)
    }
    val got = ExtensionQueries127.q470_inbatch_collisions(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // fewer, bigger batches collide more
    assert(expected.head._5 >= expected.last._5)
  }

  test("q471: weighted kappa matches the brute 5x5 contingency model") {
    val bands = graft.core.Tables.documents(spark, dir)
      .select(col("text")).collect()
      .map { r =>
        val ts = r.getString(0).split(" ", -1)
        (math.min(4L, ts.length.toLong / 15), math.min(4L, ts.distinct.length.toLong / 15))
      }
    val n = bands.length.toLong
    val o = bands.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rowm = bands.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val colm = bands.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val sumWo = o.map { case ((i, j), c) => math.abs(i - j) * c }.sum
    val sumWe = (for (i <- rowm.keys; j <- colm.keys)
      yield BigInt(math.abs(i - j)) * rowm(i) * colm(j)).sum
    val kappa = (BigInt(1000) - BigInt(sumWo) * n * 1000 / sumWe).toLong
    val g = ExtensionQueries127.q471_weighted_kappa(spark, dir).collect().head
    assert((g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3)) ==
      ((n, sumWo, sumWe.toLong, kappa)))
    // the two raters are positively associated but not identical
    assert(kappa > 0L && kappa < 1000L)
  }
}
