package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries124

/** Driver-model pins for q456-q459 (novelty decay, dedup threshold
  * sweep, dispersion index, source-exclusive shingles): recomputed from
  * collected sf0.001 rows in plain Scala + BigInt with the same
  * shingle-hash, decile, and truncation conventions.
  */
class ExtensionQueries124Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  /** mirror of Dedup.shingleHashes: 3-token shingles joined by ' ',
    * poly-hash base 31 mod 1e9+7 over the bytes */
  private def shingles(text: String): Set[Long] = {
    val ts = text.split(" ", -1)
    if (ts.length < 3) Set.empty
    else ts.sliding(3).map { w =>
      w.mkString(" ").foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    }.toSet
  }

  private def docs(): Seq[(Long, String, Set[Long])] =
    graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), shingles(r.getString(2))))
      .filter(_._3.nonEmpty).toSeq.sortBy(_._1)

  test("q456: per-decile novelty equals the brute first-occurrence model") {
    val d = docs()
    val n = d.length.toLong
    val firstDoc = d.flatMap(x => x._3.map(sh => (sh, x._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expected = d.zipWithIndex.flatMap { case ((id, _, shs), idx) =>
      shs.toSeq.map(sh => ((idx.toLong * 10) / n, id == firstDoc(sh)))
    }.groupBy(_._1).toSeq.sortBy(_._1).map { case (dec, xs) =>
      val ng = xs.length.toLong
      val nov = xs.count(_._2).toLong
      (dec, ng, nov, nov * 1000000L / ng)
    }
    val got = ExtensionQueries124.q456_novelty_decay(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // the curve must actually decay for the query to be a meaningful pin
    assert(expected.head._4 > expected.last._4)
  }

  test("q457: threshold sweep equals the brute exact-Jaccard model") {
    // round-16 semantics: exact STRING shingles (the PPJoin generator),
    // no hash, no hot cap
    val d = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val ts = r.getString(1).split(" ", -1)
        (r.getLong(0),
          if (ts.length < 3) Set.empty[String]
          else ts.toSeq.sliding(3).map(_.mkString(" ")).toSet)
      }.filter(_._2.nonEmpty).toSeq.sortBy(_._1)
    val total = graft.core.Tables.documents(spark, dir).count()
    val pairs = for {
      i <- d.indices; j <- (i + 1) until d.length
      inter = d(i)._2.intersect(d(j)._2).size.toLong
      if inter > 0
    } yield (inter * 1000000L / (d(i)._2.size + d(j)._2.size - inter),
      d(i)._1, d(j)._1)
    val expected = (5L to 9L).map(_ * 100000L).map { t =>
      val hit = pairs.filter(_._1 >= t)
      val docsHit = hit.flatMap(p => Seq(p._2, p._3)).distinct.length.toLong
      (t, hit.length.toLong, docsHit, docsHit * 1000000L / total)
    }
    val got = ExtensionQueries124.q457_dedup_threshold_sweep(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // ensure the sweep sees at least one pair, else the pin is vacuous
    assert(expected.head._2 > 0L)
  }

  test("q458: dispersion indices equal the brute variance/mean model") {
    val ev = graft.core.Tables.events(spark, dir)
      .select(col("user_id"), expr("ts div 1000 div 86400000000").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def idx(xs: Seq[Long]): (Long, Long, Long) = {
      val n = BigInt(xs.length)
      val sx = BigInt(xs.sum)
      val sxx = xs.map(x => BigInt(x) * x).sum
      (xs.length.toLong, xs.sum,
        ((n * sxx - sx * sx) * 1000 / ((n - 1) * sx)).toLong)
    }
    val byDay = idx(ev.groupBy(_._2).values.map(_.length.toLong).toSeq)
    val byUser = idx(ev.groupBy(_._1).values.map(_.length.toLong).toSeq)
    val got = ExtensionQueries124.q458_dispersion_index(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(("day", byDay._1, byDay._2, byDay._3),
      ("user", byUser._1, byUser._2, byUser._3)))
  }

  test("q459: source-exclusive shingle rates equal the brute model") {
    val d = docs()
    val bySource = d.flatMap(x => x._3.map(sh => (x._2, sh)))
    val spread = bySource.map(_._2).distinct
      .map(sh => sh -> bySource.filter(_._2 == sh).map(_._1).distinct.length).toMap
    val expected = bySource.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, xs) =>
      val inst = xs.length.toLong
      val excl = xs.count(x => spread(x._2) == 1).toLong
      (src, xs.map(_._2).distinct.length.toLong, inst, excl,
        excl * 1000000L / inst)
    }
    val got = ExtensionQueries124.q459_source_oov_rate(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // exclusivity must be non-degenerate at the shingle level
    assert(expected.exists(_._4 > 0L))
  }
}
