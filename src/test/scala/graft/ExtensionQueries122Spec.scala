package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries122

/** Driver-model pins for q448-q451 (Youden threshold, capture-recapture,
  * Gini feature ranking, Hodges-Lehmann): recomputed from collected
  * sf0.001 rows in plain Scala + BigInt with the same truncation and
  * tiebreak conventions.
  */
class ExtensionQueries122Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private val funcWords = Set("the", "of", "and", "to", "in", "a", "is", "that", "it", "for")

  test("q448: best-J operating point equals the brute ROC sweep") {
    val docs = graft.core.Tables.documents(spark, dir)
      .select(col("text"), col("lang")).collect()
      .map { r =>
        val ts = r.getString(0).split(" ", -1)
        (ts.count(funcWords).toLong * 1000000L / ts.length, r.getString(1) == "en")
      }
    val p = docs.count(_._2).toLong
    val n = docs.length.toLong - p
    val best = docs.map(_._1).distinct.map { t =>
      val tp = docs.count(d => d._1 >= t && d._2).toLong
      val fp = docs.count(d => d._1 >= t && !d._2).toLong
      val j = tp * 1000000L / p - fp * 1000000L / n
      (t, tp, fp, tp * 1000000L / p, fp * 1000000L / n, j)
    }.minBy(r => (-r._6, r._1))
    val got = ExtensionQueries122.q448_youden_threshold(spark, dir).collect()
    assert(got.length == 1)
    val g = got.head
    assert((g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3),
      g.getLong(4), g.getLong(5)) == best)
    // the heuristic must separate en from non-en at least somewhat for
    // the argmax to be a meaningful pin
    assert(best._6 > 0L)
  }

  test("q449: LP and Chapman estimates match the brute capture model") {
    val users = graft.core.Tables.events(spark, dir)
      .select(col("user_id")).distinct().collect().map(_.getLong(0))
    val inA = users.filter(u => ((u * 1103515245L + 12345L) % 2147483648L) % 10 < 3)
    val inB = users.filter(u => ((u * 69069L + 1L) % 2147483648L) % 10 < 3)
    val m = inA.toSet.intersect(inB.toSet).size.toLong
    val (n1, n2, trueN) = (inA.length.toLong, inB.length.toLong, users.length.toLong)
    val lp = n1 * n2 / m
    val chapman = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    val errPpm = (BigInt(chapman - trueN) * 1000000 / trueN).toLong
    val g = ExtensionQueries122.q449_capture_recapture(spark, dir).collect().head
    assert((g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3),
      g.getLong(4), g.getLong(5), g.getLong(6)) ==
      ((trueN, n1, n2, m, lp, chapman, errPpm)))
    // ~30% captures must overlap for the estimator to be defined
    assert(m > 0L)
  }

  test("q450: feature ranking equals the brute Gini-gain model") {
    val li = graft.core.Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"),
        month(col("l_shipdate")).cast("string").as("m"),
        expr("CAST(CAST(l_quantity AS BIGINT) div 10 AS STRING)").as("qb"),
        expr("CAST(round(l_discount * 10000) AS BIGINT) >= 500").as("pos"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3),
        r.getBoolean(4)))
    val n = li.length.toLong
    val pos = li.count(_._5).toLong
    val parentPpm = (BigInt(2) * pos * (n - pos) * 1000000 / (BigInt(n) * n)).toLong
    def childPpm(key: ((String, String, String, String, Boolean)) => String): (Long, Long) = {
      val groups = li.groupBy(key)
      val s = groups.values.map { xs =>
        val nv = xs.length.toLong
        val pv = xs.count(_._5).toLong
        (BigInt(2) * pv * (nv - pv) * 1000000 / nv).toLong
      }.sum
      (groups.size.toLong, s / n)
    }
    val expected = Seq(
      ("returnflag", childPpm(_._1)), ("linestatus", childPpm(_._2)),
      ("ship_month", childPpm(_._3)), ("qty_band", childPpm(_._4)))
      .map { case (f, (nv, c)) => (f, nv, c, parentPpm, parentPpm - c) }
      .sortBy(r => (-r._5, r._1))
    val got = ExtensionQueries122.q450_gini_feature_ranking(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
  }

  test("q451: HL shift equals the brute pairwise-difference median") {
    def daily(tpe: String): Map[Long, Long] = graft.core.Tables.events(spark, dir)
      .filter(col("event_type") === tpe)
      .groupBy(expr("ts div 1000 div 86400000000").as("day"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val x = daily("view").values.toSeq
    val y = daily("click").values.toSeq
    val diffs = (for (a <- x; b <- y) yield b - a).sorted
    val nPairs = diffs.length.toLong
    val hl = diffs(((nPairs + 1) / 2 - 1).toInt)
    val g = ExtensionQueries122.q451_hodges_lehmann(spark, dir).collect().head
    assert((g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3)) ==
      ((x.length.toLong, y.length.toLong, nPairs, hl)))
  }
}
