package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries117

/** Semantics pin for q435 (decision stump). */
class ExtensionQueries117Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q435: the chosen split minimizes truncated weighted Gini over every threshold") {
    val spend = graft.core.Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT)) div 100").as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val seg = graft.core.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val data = spend.map { case (ck, v) => (v, seg(ck) == "BUILDING") }
    val n = data.length.toLong
    val p = data.count(_._2).toLong
    def giniPpm(t: Long): Long = {
      val (l, r) = data.partition(_._1 <= t)
      val (nl, pl) = (l.length.toLong, l.count(_._2).toLong)
      val (nr, pr) = (r.length.toLong, r.count(_._2).toLong)
      val f = BigInt(nl * nl - pl * pl - (nl - pl) * (nl - pl)) * nr +
        BigInt(nr * nr - pr * pr - (nr - pr) * (nr - pr)) * nl
      (f * 1000000 / (BigInt(n) * nl * nr)).toLong
    }
    val thresholds = data.map(_._1).distinct.sorted.dropRight(1)
    val best = thresholds.map(t => (giniPpm(t), t)).min // (ppm, v) lexicographic
    val rootPpm = (BigInt(n * n - p * p - (n - p) * (n - p)) * 1000000 /
      (BigInt(n) * n)).toLong
    val row = ExtensionQueries117.q435_decision_stump(spark, dir).collect().head
    assert(row.getLong(0) == best._2, s"split ${row.getLong(0)} != ${best._2}")
    assert(row.getLong(1) == data.count(_._1 <= best._2).toLong)
    assert(row.getLong(3) == rootPpm)
    assert(row.getLong(4) == best._1)
    assert(row.getLong(5) == rootPpm - best._1)
    // segments are spend-independent: the best stump barely reduces
    // impurity (no leakage of the label into the feature)
    assert(row.getLong(5) * 50 < rootPpm, s"suspicious reduction ${row.getLong(5)}")
  }
}
