package graft

import graft.queries.{ExtensionQueries64, ExtensionQueries65}

/** Semantic pins for the round-11 corpus-governance batch (cross-engine
  * equality is the DuckDB oracle's job — these re-derive each result
  * with independent driver-side BigInt/Double arithmetic and assert the
  * STATISTICS the mirrors must reproduce: FS independence lifts, decade
  * partitioning of the rank axis, the argmin assignment tie-break).
  */
class ExtensionQueries65Spec extends SparkSpecBase {

  import org.apache.spark.sql.functions._

  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Code-point take — Spark's substring counts code points, not UTF-16
    * units, so `String.take` would diverge on astral chars.
    */
  private def cpTake(s: String, n: Int): String = {
    val it = s.codePoints().iterator(); val sb = new StringBuilder; var k = 0
    while (k < n && it.hasNext) { sb.appendAll(Character.toChars(it.next())); k += 1 }
    sb.toString
  }

  /** Driver-side FS table: same comparators, BigInt-exact ppm math. */
  private def fsTable(docs: Seq[(Long, String, String, String, Long)])
      : Map[String, (Long, Long, Long)] = {
    val enriched = docs.map { case (id, text, lang, source, nc) =>
      (id, lang, source, nc / 20, nc, md5hex(text), cpTake(text, 12))
    }
    val pairs = for {
      a <- enriched; b <- enriched
      if a._1 < b._1 && a._2 == b._2 && a._3 == b._3 && a._4 == b._4
    } yield (
      if (a._6 == b._6) 1 else 0,
      if (a._5 == b._5) 1 else 0,
      if (a._7 == b._7) 1 else 0)
    val n = BigInt(pairs.size)
    val mHash = BigInt(pairs.count(_._1 == 1))
    val mLen = BigInt(pairs.count(_._2 == 1))
    val mPfx = BigInt(pairs.count(_._3 == 1))
    pairs.groupBy(identity).map { case ((ah, al, ap), ps) =>
      val prod = (if (ah == 1) mHash else n - mHash) *
        (if (al == 1) mLen else n - mLen) *
        (if (ap == 1) mPfx else n - mPfx)
      val expected = prod * 1000000 / (n * n)
      val lift = BigInt(ps.size) * n * n * 1000000 / prod
      s"$ah$al$ap" -> (ps.size.toLong, expected.toLong, lift.toLong)
    }
  }

  test("q288: planted exact dups make the all-agree pattern's lift; every row BigInt-exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("eq65").toString
    val base = "the quick brown fox jumps over the dog " // 39 chars; +1/+2 char rows land in blk 2
    val docs = Seq[(Long, String, String, String)](
      (1L, base + "a", "en", "s1"),   // exact dup of 2
      (2L, base + "a", "en", "s1"),
      (3L, base + "b", "en", "s1"),   // same prefix + length, different text
      (4L, "zz" + base.substring(0, 37) + "c", "en", "s1"), // same length, other prefix
      (5L, base + "ab", "en", "s1"),  // len 41: same blk (41 div 20 = 2 vs 40 div 20 = 2)
      (6L, base + "a", "fr", "s1"),   // other block (lang)
      (7L, base + "a", "en", "s2"))   // other block (source)
    val rows = docs.map { case (id, t, l, src) => (id, t, l, src, t.length.toLong) }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = ExtensionQueries65.q288_linkage_patterns(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val want = fsTable(rows)
    assert(got == want)
    // the planted exact-dup pair is the sole all-agree pattern, and its
    // observed count beats independence (lift strictly above 1e6)
    assert(got("111")._1 == 1L && got("111")._3 > 1000000L)
  }

  test("q288: patterns partition the blocked-pair space on real sf0.001 docs") {
    val out = ExtensionQueries65.q288_linkage_patterns(spark, sf).collect()
    assert(out.map(_.getString(0)).distinct.length == out.length)
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq
    val want = fsTable(docs)
    val got = out.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want)
    assert(out.map(_.getLong(1)).sum == want.values.map(_._1).sum)
  }

  test("q289: decade rows == a collected wordcount recomputation, tail row included") {
    val texts = graft.core.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0)).toSeq
    val tf = texts.flatMap(_.split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).map { case (t, xs) => (t, xs.size.toLong) }.toSeq
    val ranked = tf.sortBy { case (t, f) => (-f, t) }.zipWithIndex
      .map { case ((t, f), i) => (i + 1, f) }
    val total = tf.map(_._2).sum
    val top = ranked.filter(_._1 <= 9999)
    val byDecade = top.groupBy { case (r, _) => (r.toString.length - 1).toString }
      .map { case (d, xs) => d -> (xs.size.toLong, xs.map(_._2).sum) }
    val tail = ("tail", (tf.size.toLong - top.size, total - top.map(_._2).sum))
    val want = (byDecade + tail).map { case (d, (n, m)) =>
      d -> (n, m, m * 1000000L / total)
    }
    val got = ExtensionQueries65.q289_zipf_decades(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want)
    assert(got.contains("tail")) // always emitted, even at zero mass
    assert(got.values.map(_._2).sum == total) // masses partition the corpus
  }

  test("q290: occupancy sums to the corpus; every list matches the loaded-centroid argmin") {
    val out = ExtensionQueries65.q290_ivf_utilization(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val emb = graft.core.Tables.embeddings(spark, sf)
      .select("embedding").collect()
      .map(_.getSeq[Any](0).map(x => x.asInstanceOf[Number].doubleValue).toArray)
    assert(out.map(_._2).sum == emb.length)
    val (ivf, _, _, _) = ExtensionQueries64.loadedModels(spark, sf)
    // same fold, same tie-break: in-order squared-diff sum; first index wins ties
    def assign(v: Array[Double]): Int = {
      var best = -1; var bd = Double.MaxValue
      for (i <- ivf.centroids.indices) {
        val c = ivf.centroids(i); var acc = 0.0; var j = 0
        while (j < v.length) { val d = v(j) - c(j); acc += d * d; j += 1 }
        if (acc < bd) { bd = acc; best = i }
      }
      best
    }
    val want = emb.map(assign).groupBy(identity)
      .map { case (l, xs) => (l, xs.length.toLong) }
    assert(out.map(r => (r._1, r._2)).toMap == want)
    val uniform = 1000000L / ivf.centroids.length
    out.foreach { case (_, n, share, skew) =>
      assert(share == n * 1000000L / emb.length)
      assert(skew == share - uniform)
    }
  }
}
