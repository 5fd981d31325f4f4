package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries109

/** Semantics pins for q413-q415 (repetition, Cochran's Q, Tukey
  * fences).
  */
class ExtensionQueries109Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q413: dup ratio and max multiplicity equal a token-level recount") {
    val docs = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // driver-side polyhash reimplementation (the query counts distinct
    // HASHES, so the recount must hash the same way — a polyhash
    // collision between different grams would otherwise diverge)
    def ph(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((a, b) => (a * 31 + b) % 1000000007L)
    val perDoc = docs.flatMap { case (_, src, text) =>
      val toks = text.split(" ", -1)
      if (toks.length < 3) None
      else {
        val grams = toks.sliding(3).map(w => ph(w.mkString(" "))).toSeq
        val total = grams.size.toLong
        val dupPpm = (total - grams.distinct.size) * 1000000 / total
        val maxMult = grams.groupBy(identity).values.map(_.size.toLong).max
        Some((src, dupPpm, maxMult))
      }
    }
    val expected = perDoc.groupBy(_._1).map { case (src, xs) =>
      src -> (xs.size.toLong, xs.map(_._2).sum / xs.size,
        xs.count(_._2 >= 100000L).toLong, xs.map(_._3).max)
    }
    val got = ExtensionQueries109.q413_repetition_ngrams(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expected)
    // corpus fact: the synthetic docs repeat shared-vocab 3-grams — the
    // stat must be non-degenerate (some duplication somewhere)
    assert(got.values.exists(_._2 > 0L))
  }

  test("q414: Q equals the driver matched-binary model") {
    val ev = graft.core.Tables.events(spark, dir)
      .select(col("user_id"), expr("ts div 1000").as("us"),
        (col("value") >= 100.0).as("hi")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val t0 = ev.map(_._2).min
    val t1 = ev.map(_._2).max + 1
    val flags = ev.groupBy(_._1).map { case (_, xs) =>
      (0 to 2).map(j => if (xs.exists(e =>
        math.min((e._2 - t0) * 3 / (t1 - t0), 2) == j && e._3)) 1L else 0L)
    }.toSeq
    val g = (0 to 2).map(j => flags.map(_(j)).sum)
    val t = g.sum
    val l2 = flags.map(f => { val l = f.sum; l * l }).sum
    val expQ = if (3 * t - l2 == 0) 0L
      else 2 * (3 * g.map(x => x * x).sum - t * t) * 1000 / (3 * t - l2)
    val row = ExtensionQueries109.q414_cochran_q(spark, dir).collect().head
    assert(row.getLong(0) == flags.size.toLong)
    assert((row.getLong(1), row.getLong(2), row.getLong(3)) == ((g(0), g(1), g(2))))
    assert(row.getLong(4) == expQ, s"q_milli ${row.getLong(4)} != $expQ")
  }

  test("q415: fences equal the discrete-quartile rule; outliers land outside them") {
    val spend = graft.core.Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT)) div 100").as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val seg = graft.core.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val bySeg = spend.map { case (ck, v) => seg(ck) -> v }.groupBy(_._1)
    def disc(vs: Seq[Long], q: Double): Long = {
      val s = vs.sorted
      s(math.ceil(q * s.size).toInt - 1) // smallest value with CDF >= q
    }
    val got = ExtensionQueries109.q415_tukey_fences(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))).toMap
    for ((sg, xs) <- bySeg) {
      val vs = xs.map(_._2)
      val (q1, q3) = (disc(vs, 0.25), disc(vs, 0.75))
      val iqr15 = 3 * (q3 - q1) / 2
      val (lo, hi) = (q1 - iqr15, q3 + iqr15)
      val (n, gq1, gq3, glo, ghi, nLow, nHigh, mass) = got(sg)
      assert(n == vs.size.toLong)
      assert((gq1, gq3, glo, ghi) == ((q1, q3, lo, hi)))
      assert(nLow == vs.count(_ < lo).toLong)
      assert(nHigh == vs.count(_ > hi).toLong)
      assert(mass == vs.filter(_ > hi).sum)
    }
  }
}
