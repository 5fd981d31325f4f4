package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries126

/** Driver-model pins for q464-q467 (MinHash calibration, max-to-sum,
  * Ansari-Bradley, Chao1/Good-Turing): recomputed from collected
  * sf0.001 rows in plain Scala + BigInt with the same hash, rank, and
  * truncation conventions.
  */
class ExtensionQueries126Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private val M = 1000000007L

  private def polyHash(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % M)

  private def shingleHashes(text: String): Seq[Long] = {
    val ts = text.split(" ", -1)
    if (ts.length < 3) Seq.empty
    else ts.sliding(3).map(w => polyHash(w.mkString(" "))).toSeq
  }

  private def minhash(hashes: Seq[Long], n: Int): Seq[Long] =
    (0 until n).map { i =>
      val a = ((2L * i + 1) * 2654435761L) % M
      val b = 40503L * i + 1
      hashes.map(h => (h * a + b) % M).min
    }

  test("q464: estimator error buckets equal the brute sig-vs-exact model") {
    // Round-16 semantics: the calibration pair frame is the UNION of the
    // two decision surfaces — exact string-shingle J >= 0.5 pairs (the
    // PPJoin side) and 16x4 banded-LSH candidates (the estimator side).
    val docs = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.split(" ", -1).length >= 3).sortBy(_._1)
    val strSets = docs.map { case (id, t) =>
      id -> t.split(" ", -1).toSeq.sliding(3).map(_.mkString(" ")).toSet
    }.toMap
    val sigs = docs.map { case (id, t) => id -> minhash(shingleHashes(t), 64) }.toMap
    def bandKeys(sig: Seq[Long]): Seq[Long] =
      (0 until 16).map(b => sig.slice(b * 4, b * 4 + 4)
        .foldLeft(0L)((a, x) => (a * 31 + x) % M))
    val bands = docs.map { case (id, _) => id -> bandKeys(sigs(id)) }.toMap
    def exactPpm(a: Long, b: Long): Long = {
      val (sa, sb) = (strSets(a), strSets(b))
      val inter = sa.intersect(sb).size.toLong
      inter * 1000000L / (sa.size + sb.size - inter)
    }
    val cand = (for {
      i <- docs.indices; j <- (i + 1) until docs.length
      a = docs(i)._1; b = docs(j)._1
      if exactPpm(a, b) >= 500000L ||
        bands(a).zip(bands(b)).exists(p => p._1 == p._2)
    } yield (a, b)).toSet
    val errs = cand.toSeq.map { case (a, b) =>
      val matches = sigs(a).zip(sigs(b)).count(p => p._1 == p._2).toLong
      matches * 1000000L / 64 - exactPpm(a, b)
    }
    val expected = errs.groupBy(e => math.abs(e) / 100000).toSeq.sortBy(_._1)
      .map { case (bk, es) => (bk, es.length.toLong, es.sum / es.length) }
    val got = ExtensionQueries126.q464_minhash_calibration(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // calibration only means something when some pairs exist, and the
    // union must be strictly richer than either side alone
    assert(expected.map(_._2).sum > 0L)
    assert(cand.exists { case (a, b) => exactPpm(a, b) < 500000L },
      "no estimator-side-only pairs — the false-positive direction is untested")
  }

  test("q465: max-to-sum ratios equal the brute moment model") {
    val usd = graft.core.Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT)) div 100").as("usd"))
      .collect().map(_.getLong(1))
    val expected = (1L to 4L).map { k =>
      val xk = usd.map(c => BigInt(c).pow(k.toInt))
      (k, usd.length.toLong, (xk.max * 1000000 / xk.sum).toLong)
    }
    val got = ExtensionQueries126.q465_max_to_sum(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // R_k must be a share
    assert(expected.forall(r => r._3 > 0L && r._3 <= 1000000L))
  }

  test("q466: AB statistic and null moments equal the brute rank model") {
    def series(tpe: String, tag: String) = graft.core.Tables.events(spark, dir)
      .filter(col("event_type") === tpe)
      .groupBy(expr("ts div 1000 div 86400000000").as("day"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      .collect().map(r => (r.getLong(1), r.getLong(0), tag)).toSeq
    val pooled = (series("click", "c") ++ series("view", "v"))
      .sortBy(x => (x._1, x._2, x._3))
    val nn = pooled.length.toLong
    val m = pooled.count(_._3 == "c").toLong
    val n = nn - m
    val w = pooled.zipWithIndex.collect { case ((_, _, "c"), i) =>
      math.min(i + 1L, nn - i)
    }.sum
    val (mean, varr) =
      if (nn % 2 == 0)
        (m * (nn + 2) * 1000 / 4, m * n * (nn + 2) * (nn - 2) * 1000 / (48 * (nn - 1)))
      else
        (m * (nn + 1) * (nn + 1) * 1000 / (4 * nn),
          m * n * (nn + 1) * (3 + nn * nn) * 1000 / (48 * nn * nn))
    val g = ExtensionQueries126.q466_ansari_bradley(spark, dir).collect().head
    assert((g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3), g.getLong(4)) ==
      ((m, n, w, mean, varr)))
  }

  test("q467: per-lang Chao1 and coverage equal the brute frequency model") {
    val docs = graft.core.Tables.documents(spark, dir)
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), shingleHashes(r.getString(1)).toSet))
      .filter(_._2.nonEmpty)
    val expected = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (lang, ds) =>
      val freq = ds.flatMap(_._2.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      val sObs = freq.size.toLong
      val mInst = freq.values.sum.toLong
      val f1 = freq.values.count(_ == 1).toLong
      val f2 = freq.values.count(_ == 2).toLong
      val chao1 = sObs + (if (f2 > 0) (BigInt(f1) * f1 / (2 * f2)).toLong
        else (BigInt(f1) * (f1 - 1) / 2).toLong)
      (lang, sObs, f1, f2, mInst, chao1, (mInst - f1) * 1000000L / mInst)
    }
    val got = ExtensionQueries126.q467_chao1_richness(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expected)
    // Chao1 never undershoots the observed richness
    assert(expected.forall(e => e._6 >= e._2))
  }
}
