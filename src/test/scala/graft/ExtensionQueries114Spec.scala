package graft

import org.apache.spark.sql.functions._

import graft.queries.{ExtensionQueries114, ExtensionQueries89}

/** Semantics pins for q429-q430 (L-moments, dedup transitivity). */
class ExtensionQueries114Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q429: L-moments equal the direct order-statistics computation; tau4 is near-Gaussian") {
    val vs = graft.core.Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT)) div 100").as("v"))
      .collect().map(_.getLong(1)).sorted
    val n = vs.length.toLong
    def s(r: Int): BigInt = vs.zipWithIndex.map { case (x, idx) =>
      val i = idx + 1L
      (1 to r).foldLeft(BigInt(x))((a, j) => a * (i - j))
    }.sum
    val (s0, s1, s2, s3) = (s(0), s(1), s(2), s(3))
    val l2num = 2 * s1 - (n - 1) * s0
    val row = ExtensionQueries114.q429_l_moments(spark, dir).collect().head
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == (s0 * 1000 / n).toLong)
    assert(row.getLong(2) == (l2num * 1000 / (BigInt(n) * (n - 1))).toLong)
    val tau3 = ((6 * s2 - 6 * (n - 2) * s1 + BigInt(n - 1) * (n - 2) * s0) * 1000000 /
      (BigInt(n - 2) * l2num)).toLong
    val tau4 = ((20 * s3 - 30 * (n - 3) * s2 + 12 * BigInt(n - 2) * (n - 3) * s1 -
      BigInt(n - 1) * (n - 2) * (n - 3) * s0) * 1000000 /
      (BigInt(n - 2) * (n - 3) * l2num)).toLong
    assert(row.getLong(3) == tau3, s"tau3 ${row.getLong(3)} != $tau3")
    assert(row.getLong(4) == tau4, s"tau4 ${row.getLong(4)} != $tau4")
    // spend sums ~Irwin-Hall-ish: tau4 should sit near the Gaussian
    // 0.1226 and far from the exponential 0.1667 (loose brackets)
    assert(row.getLong(4) > 50000L && row.getLong(4) < 200000L)
    assert(row.getLong(2) > 0L) // l2 is a positive dispersion
  }

  test("q430: wedge/closure counts equal the driver graph model; this corpus's pairs are disjoint") {
    val pairs = ExtensionQueries89.q358_edit_distance_dedup(spark, dir)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // r15: q430's audit now FEEDS from q358b's banded candidates (the
    // production path) — valid only while banded pairs == exact pairs.
    // q358c certifies it by counts; this asserts SET equality outright,
    // so the driver model below (built from the exact pairs) pins the
    // banded-fed audit too.
    val banded = graft.queries.ExtensionQueries106
      .q358b_banded_edit_dedup(spark, dir)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(banded.toSet == pairs.toSet,
      s"banded pair set diverged from exact: ${banded.toSet.diff(pairs.toSet)} extra, " +
        s"${pairs.toSet.diff(banded.toSet)} missing")
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).toSet }
    var wedges = 0L; var closed = 0L
    val pairSet = pairs.toSet
    for ((_, nbs) <- adj; u <- nbs; w <- nbs if u < w) {
      wedges += 1
      if (pairSet((u, w)) || pairSet((w, u))) closed += 1
    }
    val row = ExtensionQueries114.q430_dedup_transitivity(spark, dir).collect().head
    assert(row.getLong(0) == pairs.length.toLong)
    assert(row.getLong(1) == wedges && row.getLong(2) == closed)
    assert(row.getLong(3) ==
      (if (wedges == 0) 1000000L else closed * 1000000 / wedges))
    // corpus fact (pinned): the planted near-dup pairs are DISJOINT
    // (no shared endpoints), so CC-clustering them is trivially safe
    assert(wedges == 0L)
  }
}
