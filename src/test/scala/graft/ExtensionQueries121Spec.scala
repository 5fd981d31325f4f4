package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries121

/** Driver-model pins for q446-q447 (calibration/ECE, cumulative gains):
  * recomputed from collected sf0.001 rows with the same rank, decile,
  * and truncation conventions in plain Scala + BigInt.
  */
class ExtensionQueries121Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private val funcWords = Set("the", "of", "and", "to", "in", "a", "is", "that", "it", "for")

  test("q446: decile table and ECE equal the brute calibration model") {
    val docs = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang")).collect()
      .map { r =>
        val ts = r.getString(1).split(" ", -1)
        val score = ts.count(funcWords).toLong * 1000000L / ts.length
        (r.getLong(0), score, r.getString(2) == "en")
      }
    val n = docs.length.toLong
    val ranked = docs.sortBy(d => (d._2, d._1)).zipWithIndex
      .map { case ((_, score, pos), idx) => ((idx.toLong * 10) / n, score, pos) }
    val buckets = ranked.groupBy(_._1).toSeq.sortBy(_._1).map { case (d, xs) =>
      val nd = xs.length.toLong
      val conf = xs.map(_._2).sum / nd
      val acc = xs.count(_._3).toLong * 1000000L / nd
      (d, nd, conf, acc, math.abs(conf - acc))
    }
    val ece = buckets.map(b => b._2 * b._5).sum / buckets.map(_._2).sum
    val got = ExtensionQueries121.q446_calibration_ece(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == buckets.map(b => (b._1, b._2, b._3, b._4, b._5, ece)))
    // the crude heuristic must be imperfectly calibrated for the query
    // to be a meaningful pin
    assert(ece > 0L)
  }

  test("q447: gains/lift table equals the brute ranking model") {
    val cust = graft.core.Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT))").as("cents"),
        max(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)).as("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = cust.length.toLong
    val totPos = cust.map(_._3).sum
    val ranked = cust.sortBy(c => (-c._2, c._1)).zipWithIndex
      .map { case ((_, _, pos), idx) => ((idx.toLong * 10) / n, pos) }
    val perDec = ranked.groupBy(_._1).view
      .mapValues(xs => (xs.length.toLong, xs.map(_._2).sum)).toMap
    val expected = perDec.keys.toSeq.sorted.map { d =>
      val cumN = perDec.filter(_._1 <= d).values.map(_._1).sum
      val cumPos = perDec.filter(_._1 <= d).values.map(_._2).sum
      (d, cumN, cumPos, cumPos * 1000000L / totPos,
        BigInt(cumPos) * n * 1000 / (BigInt(totPos) * cumN))
    }
    val got = ExtensionQueries121.q447_cumulative_gains(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        BigInt(r.getLong(4)))).toSeq
    assert(got == expected)
    // gains curve ends at full capture and is non-decreasing
    assert(expected.last._4 == 1000000L)
    assert(expected.map(_._3).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
  }
}
