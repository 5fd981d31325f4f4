package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries89

/** Semantics pins for the text-quality/uncertainty batch (q358-q360):
  * driver-side recomputation from the raw tables.
  */
class ExtensionQueries89Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1) {
      j => if (i == 0) j else if (j == 0) i else 0 })
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("q358: pairs equal the driver Levenshtein recount; blocking loses no close pair") {
    val docs = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    def block(d: (Long, String, Long, String)) =
      (d._2, d._3 / 100, d._4.split(" ").head)
    val ref = (for {
      i <- docs.indices; j <- docs.indices
      if i != j && docs(i)._1 < docs(j)._1 && block(docs(i)) == block(docs(j))
      dist = lev(docs(i)._4.take(60), docs(j)._4.take(60)) if dist <= 20
    } yield (docs(i)._1, docs(j)._1, dist.toLong)).sorted
    val got = ExtensionQueries89.q358_edit_distance_dedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == ref)
    assert(got.nonEmpty, "corpus contains identical-prefix docs; none found")
    // the word-soup corpus repeats openings: identical 60-char prefixes
    // (dist = 0) must be among the hits — they are what dedup would drop
    assert(got.exists(_._3 == 0L), s"no exact-prefix pair among $got")
  }

  test("q359: FORCAST milli-units equal the driver syllable recount") {
    val docs = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def groups(w: String): Long = {
      var g = 0L; var in = false
      for (c <- w) {
        val v = "aeiou".contains(c)
        if (v && !in) g += 1
        in = v
      }
      g
    }
    val ref = docs.map { case (id, t) =>
      val gs = t.split(" ").map(groups)
      val (n, syl) = (gs.length.toLong, gs.sum)
      val mono = gs.count(_ == 1L).toLong
      (id, n, syl, mono, gs.count(_ >= 3L).toLong,
        syl * 1000 / n, 20000 - mono * 15000 / n)
    }.sortBy(_._1)
    val got = ExtensionQueries89.q359_forcast_readability(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == ref.toSeq)
  }

  test("q360: bootstrap CI equals the driver resampling; interval brackets the mean") {
    val base = graft.core.Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT)) div count(1)").as("m"))
      .orderBy(col("o_custkey")).collect().map(_.getLong(1))
    val n = base.length.toLong
    def minstd2(gid: Long): Long =
      48271L * (((48271L * (gid + 1)) % 2147483647L) + 1) % 2147483647L
    val reps = (0L until 100L).map { r =>
      val s = (0L until n).map(i => base((minstd2(r * n + i) % n).toInt)).sum
      s / n
    }.sorted
    val row = ExtensionQueries89.q360_bootstrap_ci(spark, dir).collect().head
    assert(row.getLong(0) == n && row.getLong(1) == 100L)
    assert(row.getLong(2) == base.sum / n)
    assert((row.getLong(3), row.getLong(4), row.getLong(5)) ==
      (reps(2), reps(49), reps(97)))
    // a sane percentile interval is ordered and brackets the point estimate
    assert(row.getLong(3) <= row.getLong(4) && row.getLong(4) <= row.getLong(5))
    assert(row.getLong(3) <= row.getLong(2) && row.getLong(2) <= row.getLong(5),
      s"CI does not bracket the mean: $row")
  }
}
