package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries120

/** Driver-model pins for q443-q445 (dup 8-grams, lexical richness,
  * length-profile TV drift): recomputed from collected sf0.001 docs
  * with plain Scala string ops and BigInt arithmetic.
  */
class ExtensionQueries120Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private lazy val docs: Array[(Long, String, String, String)] =
    graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))

  test("q443: dup 8-gram rate equals the brute per-lang gram census") {
    val grams = docs.flatMap { case (id, text, lang, _) =>
      val ts = text.split(" ", -1)
      if (ts.length < 8) Seq.empty
      else (0 to ts.length - 8).map(i => (lang, ts.slice(i, i + 8).mkString(" "), id))
    }
    val byLang = grams.groupBy(_._1)
    val expected = byLang.toSeq.map { case (lang, gs) =>
      val perGram = gs.groupBy(_._2)
      val inst = gs.length.toLong
      val dup = perGram.valuesIterator
        .collect { case occ if occ.map(_._3).distinct.size >= 2 => occ.length.toLong }.sum
      (lang, inst, dup, perGram.size.toLong, dup * 1000000 / inst)
    }.sortBy(_._1)
    val got = ExtensionQueries120.q443_dup_ngram_rate(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    assert(expected.exists(_._3 > 0L), "expected some cross-doc duplicated grams")
  }

  test("q444: richness equals the brute token census") {
    val expected = docs.flatMap { case (_, text, _, src) =>
      text.split(" ", -1).map(src -> _)
    }.groupBy(_._1).toSeq.map { case (src, toks) =>
      val counts = toks.groupBy(_._2).view.mapValues(_.length).toMap
      val nTok = toks.length.toLong
      val nTyp = counts.size.toLong
      val nHap = counts.valuesIterator.count(_ == 1).toLong
      (src, nTok, nTyp, nHap, nTyp * 1000000 / nTok, nHap * 1000000 / nTyp)
    }.sortBy(_._1)
    val got = ExtensionQueries120.q444_lexical_richness(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
  }

  test("q445: TV drift equals the BigInt common-denominator identity") {
    val lens = docs.flatMap { case (_, text, _, src) =>
      text.split(" ", -1).map(t => (src, t.length.toLong))
    }
    val cell = lens.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val corpus = lens.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val perSrc = lens.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val n = BigInt(lens.length)
    val expected = perSrc.toSeq.sortBy(_._1).map { case (src, ns) =>
      val absdev = corpus.toSeq.map { case (l, cl) =>
        (BigInt(cell.getOrElse((src, l), 0L)) * n - BigInt(cl) * ns).abs
      }.sum
      (src, ns, (absdev * 1000000 / (2 * BigInt(ns) * n)).toLong)
    }
    val got = ExtensionQueries120.q445_length_profile_drift(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(expected.exists(_._3 > 0L), "expected nonzero drift for at least one source")
  }
}
