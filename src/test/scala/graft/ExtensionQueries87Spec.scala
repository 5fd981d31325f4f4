package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries87

/** Semantics pins for the honesty-completion batch (q353-q354). */
class ExtensionQueries87Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q353: every flagged doc shares a cluster with an eval member; planted leaks flagged") {
    val clusters = graft.queries.ExtensionQueries2
      .q42ClustersStaged(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val evalReps = clusters.filter(_._1 < 5).map(_._2).toSet
    val ref = clusters.filter(c => evalReps(c._2)).groupBy(_._2)
      .map { case (rep, ms) =>
        val ids = ms.map(_._1)
        rep -> (ids.length.toLong, ids.count(_ < 5).toLong,
          ids.count(_ >= 5).toLong,
          ids.filter(_ >= 5).sorted.mkString(","))
      }
    val rows = ExtensionQueries87.q353_cluster_decontam(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(rows == ref)
    // the q42 corpus plants near-dup variants of every doc (+100000,
    // +200000) — eval docs' variants MUST be flagged (they leak past
    // exact-gram decontam by construction)
    val flagged = rows.values.flatMap(_._4.split(",").filter(_.nonEmpty)
      .map(_.toLong)).toSet
    val planted = clusters.map(_._1).filter(id =>
      id >= 100000 && (id % 100000) < 5).toSet
    assert(planted.nonEmpty && planted.subsetOf(flagged),
      s"eval near-dup variants escaped: ${planted.diff(flagged)}")
  }

  test("q354: displacement equals the driver permutation math and reads as shuffled") {
    def hash(id: Long, a: Long): Long =
      a * (((48271L * (id + 1)) % 2147483647L) + 1) % 2147483647L
    val ids = graft.core.Tables.documents(spark, dir)
      .select("doc_id").collect().map(_.getLong(0))
    def ranks(a: Long): Map[Long, Long] =
      ids.sortBy(id => (hash(id, a), id)).zipWithIndex
        .map { case (id, i) => id -> i.toLong }.toMap
    val (p0, p1) = (ranks(48271L), ranks(69621L))
    val disps = ids.map(id => math.abs(p0(id) - p1(id)))
    val n = ids.length.toLong
    val row = ExtensionQueries87.q354_shuffle_quality(spark, dir).collect().head
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == disps.sum)
    assert(row.getLong(2) == disps.max)
    assert(row.getLong(3) == disps.count(_ == 0).toLong)
    assert(row.getLong(4) == disps.sum * 1000000L / (n * n))
    // independent permutations: mean displacement ≈ n/3 (ppm_of_n ≈
    // 333333); the r11 one-round bug would have scored ≈ 0 here
    assert(row.getLong(4) > 200000L && row.getLong(4) < 466000L,
      s"shuffle quality out of the independent-permutation band: $row")
  }
}
