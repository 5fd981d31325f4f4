package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries104

/** Semantics pins for the halving/DiD/savings batch (q402-q404). */
class ExtensionQueries104Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q402: halving equals the driver tournament; survivor pyramid is exact") {
    val ev = graft.core.Tables.events(spark, dir)
      .select((col("user_id") % 16), expr("ts div 604800000000000"),
        expr("CAST(round(value * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val w0 = ev.map(_._2).min
    def mean(c: Long, weeks: Long): Long = {
      val xs = ev.filter(e => e._1 == c && e._2 - w0 < weeks)
      if (xs.isEmpty) -4611686018427387904L else xs.map(_._3).sum * 1000 / xs.length
    }
    // configs = residues PRESENT in the data (sf0.001's few users skip
    // some); rungs_survived = 1 + cuts passed (1+past1+past2+past3)
    val configs = ev.map(_._1).distinct.sorted.toSeq
    val refSurvived = {
      var a: Seq[Long] = configs
      val m = collection.mutable.Map(configs.map(_ -> 1L): _*)
      for ((weeks, keep) <- Seq((1L, 8), (2L, 4), (4L, 2))) {
        a = a.sortBy(c => (-mean(c, weeks), c)).take(keep)
        a.foreach(c => m(c) += 1)
      }
      m.toMap
    }
    val winner = {
      var a: Seq[Long] = configs
      for ((weeks, keep) <- Seq((1L, 8), (2L, 4), (4L, 2), (8L, 1)))
        a = a.sortBy(c => (-mean(c, weeks), c)).take(keep)
      a.head
    }
    val got = ExtensionQueries104.q402_successive_halving(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.keySet == configs.toSet)
    for (c <- configs) {
      assert(got(c)._1 == refSurvived(c), s"config $c rungs")
      assert(got(c)._2 == (if (c == winner) 1L else 0L), s"config $c winner")
      assert(got(c)._3 == mean(c, 1L))
    }
    // the halving pyramid: 8 configs pass cut 1, 4 pass cut 2, 2 pass
    // cut 3, exactly one wins
    assert(got.values.count(_._1 >= 2L) == 8)
    assert(got.values.count(_._1 >= 3L) == 4)
    assert(got.values.count(_._1 >= 4L) == 2)
    assert(got.values.map(_._2).sum == 1L)
  }

  test("q402: full output frame pinned literally (r13 driver-red adjudication)") {
    // The r13 driver artifact red-rowed q402 on hash while every local
    // sweep passed: the oracle SQL's un-cast `//` divisor made the
    // DuckDB m-columns HUGEINT (→ pandas float64) against Spark's
    // int64 — cell-equal, dtype-different. The SQL now casts both
    // operands; this literal pin (values cross-computed in DuckDB from
    // the corrected SQL) freezes the whole frame so any future drift —
    // in the query, the reference model above, or the corpus — is a
    // named failure, not an inference. sf0.001 has 15 of 16 residues.
    val exp = Seq(
      (0L, 4L, 0L, 7593571L, 60L), (1L, 2L, 0L, 7988333L, 51L),
      (2L, 3L, 0L, 8073666L, 68L), (3L, 2L, 0L, 8725666L, 65L),
      (4L, 1L, 0L, 4717714L, 71L), (5L, 1L, 0L, 2709600L, 62L),
      (6L, 1L, 0L, 3508500L, 62L), (7L, 2L, 0L, 5070000L, 75L),
      (8L, 1L, 0L, 3828000L, 69L), (9L, 1L, 0L, 4612571L, 67L),
      (10L, 2L, 0L, 5703000L, 71L), (11L, 3L, 0L, 5956000L, 66L),
      (12L, 1L, 0L, 3939545L, 73L), (13L, 4L, 1L, 11077600L, 52L),
      (14L, 1L, 0L, 4341400L, 88L))
    val got = ExtensionQueries104.q402_successive_halving(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == exp)
  }

  test("q403: DiD equals the driver cell means; exchangeable halves read near zero") {
    val seg = graft.core.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> (r.getString(1) == "BUILDING")).toMap
    val o = graft.core.Tables.orders(spark, dir)
      .select(col("o_custkey"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT) div 100"))
      .collect().map(r => (seg(r.getLong(0)), r.getLong(1), r.getLong(2)))
    val (d0, d1) = (o.map(_._2).min, o.map(_._2).max)
    def m(t: Boolean, f: Long => Boolean): Long = {
      val xs = o.filter(x => x._1 == t && f(x._2)).map(_._3)
      xs.sum * 1000 / xs.length
    }
    val half = d0 + (d1 - d0) / 2
    val quarter = d0 + (d1 - d0) / 4
    val did = (m(true, _ > half) - m(true, _ <= half)) -
      (m(false, _ > half) - m(false, _ <= half))
    val placebo = (m(true, d => d > quarter && d <= half) - m(true, _ <= quarter)) -
      (m(false, d => d > quarter && d <= half) - m(false, _ <= quarter))
    val row = ExtensionQueries104.q403_diff_in_diff(spark, dir).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ==
      (m(true, _ <= half), m(true, _ > half), m(false, _ <= half), m(false, _ > half)))
    assert(row.getLong(4) == did && row.getLong(5) == placebo)
    // no intervention happened: both the estimate and the placebo must
    // read as noise relative to the mean level (within ~15%)
    val level = m(false, _ => true)
    assert(math.abs(did) * 6 < level, s"did $did vs level $level")
    assert(math.abs(placebo) * 6 < level, s"placebo $placebo vs level $level")
  }

  test("q404: savings equal the driver cluster math; keep-first drops the variant two-thirds") {
    val got = ExtensionQueries104.q404_dedup_savings(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    val clusters = graft.queries.ExtensionQueries2.q42ClustersStaged(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val keeps = clusters.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val docs = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val ref = clusters.map { case (id, rep) =>
      val (src, bt) = docs(id % 100000)
      (src, bt - (id / 100000) * 3, id != keeps(rep))
    }.groupBy(_._1).map { case (src, xs) =>
      val tot = xs.map(_._2).sum
      val dropped = xs.filter(_._3)
      src -> (xs.size.toLong, tot, dropped.size.toLong, dropped.map(_._2).sum,
        dropped.map(_._2).sum * 1000000L / tot)
    }
    assert(got == ref)
    // one keep per cluster (clusters can MERGE across base docs, so the
    // drop rate can exceed 2/3): globally dropped = staged − clusters
    val nClusters = clusters.map(_._2).distinct.length.toLong
    assert(got.values.map(_._3).sum == clusters.length - nClusters)
    val totalSaving = got.values.map(_._4).sum * 1000000L / got.values.map(_._2).sum
    assert(totalSaving > 550000L && totalSaving < 720000L, s"saving $totalSaving")
  }
}
