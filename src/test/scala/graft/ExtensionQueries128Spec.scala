package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries128

/** Driver-model pins for q472-q475 (GK lambda, signed MCC^2,
  * Cochran-Armitage, L2 step change point): recomputed from collected
  * sf0.001 rows in plain Scala + BigInt with the same rank, sign, and
  * truncation conventions.
  */
class ExtensionQueries128Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private val funcWords = Set("the", "of", "and", "to", "in", "a", "is", "that", "it", "for")

  test("q472: both lambda directions equal the brute PRE model") {
    val docs = graft.core.Tables.documents(spark, dir)
      .select(col("lang"), col("source")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = docs.length.toLong
    def lam(cells: Map[(String, String), Long], given: ((String, String)) => String,
        target: ((String, String)) => String): (Long, Long, Long) = {
      val within = cells.groupBy(kv => given(kv._1)).values
        .map(_.values.max).sum
      val marginal = cells.groupBy(kv => target(kv._1)).view
        .mapValues(_.values.sum).values.max
      (within, marginal, (within - marginal) * 1000L / (n - marginal))
    }
    val cells = docs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val bySrc = lam(cells, _._2, _._1)
    val byLang = lam(cells, _._1, _._2)
    val expected = Seq(
      ("lang|source", n, bySrc._1, bySrc._2, bySrc._3),
      ("source|lang", n, byLang._1, byLang._2, byLang._3)).sortBy(_._1)
    val got = ExtensionQueries128.q472_gk_lambda(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
  }

  test("q473: signed MCC^2 equals the brute confusion model") {
    val docs = graft.core.Tables.documents(spark, dir)
      .select(col("text"), col("lang")).collect()
      .map { r =>
        val ts = r.getString(0).split(" ", -1)
        (ts.count(funcWords).toLong * 1000000L / ts.length >= 100000L,
          r.getString(1) == "en")
      }
    val tp = docs.count(d => d._1 && d._2).toLong
    val fp = docs.count(d => d._1 && !d._2).toLong
    val fn = docs.count(d => !d._1 && d._2).toLong
    val tn = docs.count(d => !d._1 && !d._2).toLong
    val num = BigInt(tp) * tn - BigInt(fp) * fn
    val mcc2 = (num.sign * num * num * 1000000 /
      (BigInt(tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))).toLong
    val g = ExtensionQueries128.q473_matthews_mcc(spark, dir).collect().head
    assert((g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3), g.getLong(4),
      g.getLong(5)) == ((100000L, tp, fp, fn, tn, mcc2)))
  }

  test("q474: CA trend statistic equals the brute quintile model") {
    val cust = graft.core.Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT))").as("cents"),
        max(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)).as("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = cust.length.toLong
    val ranked = cust.sortBy(c => (-c._2, c._1)).zipWithIndex
      .map { case ((_, _, pos), idx) => ((idx.toLong * 5) / n, pos) }
    val a = ranked.map(_._2).sum
    val swa = ranked.map(x => x._1 * x._2).sum
    val byW = ranked.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val swn = byW.map { case (w, ng) => w * ng }.sum
    val swwn = byW.map { case (w, ng) => w * w * ng }.sum
    val tN = BigInt(n) * swa - BigInt(a) * swn
    val chi2 = (tN.sign * tN * tN * (n - 1) * 1000 /
      (BigInt(a) * (n - a) * (BigInt(n) * swwn - BigInt(swn) * swn))).toLong
    val g = ExtensionQueries128.q474_cochran_armitage(spark, dir).collect().head
    assert((g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3)) ==
      ((n, a, tN.toLong, chi2)))
  }

  test("q475: best step split equals the brute SSE-surrogate argmax") {
    val d = graft.core.Tables.events(spark, dir)
      .groupBy(expr("ts div 1000 div 86400000000").as("day"))
      .agg(count(lit(1)).as("n_ev"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    val best = d.map(_._1).dropRight(1).map { k =>
      val (l, r) = d.partition(_._1 <= k)
      val (nl, sl) = (l.length.toLong, l.map(_._2).sum)
      val (nr, sr) = (r.length.toLong, r.map(_._2).sum)
      val diff = BigInt(sl) * nr - BigInt(sr) * nl
      (k, nl, nr, sl * 1000L / nl, sr * 1000L / nr,
        (diff * diff / (BigInt(nl) * nr)).toLong)
    }.minBy(x => (-x._6, x._1))
    val g = ExtensionQueries128.q475_step_changepoint(spark, dir).collect().head
    assert((g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3), g.getLong(4),
      g.getLong(5)) == best)
  }
}
