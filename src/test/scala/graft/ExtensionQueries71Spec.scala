package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtensionQueries71

/** Semantics pins for the sampling/split batch (q305-q307): the MINSTD
  * assignment is reproducible and uniform-ish, splits PARTITION the
  * corpus, and the group-aware split never lets a source straddle
  * splits.
  */
class ExtensionQueries71Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def lcg(id: Long): Long =
    (48271L * ((48271L * (id + 1)) % 2147483647L + 1)) % 2147483647L

  test("q305: sample is deterministic, stratified, and ~1/8 per lang") {
    val a = ExtensionQueries71.q305_stratified_sample(spark, dir)
      .collect().map(_.toSeq).toSeq
    val b = ExtensionQueries71.q305_stratified_sample(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(a == b, "same query, same day, same sample")
    val totals = graft.core.Tables.documents(spark, dir)
      .groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a.map(_.head).toSet == totals.keySet, "every stratum sampled")
    a.foreach { r =>
      val (lang, n) = (r.head.asInstanceOf[String], r(1).asInstanceOf[Long])
      val total = totals(lang)
      assert(n > 0 && math.abs(n.toDouble / total - 0.125) < 0.1,
        s"$lang: $n of $total far from 1/8")
    }
    // checksum really is the sampled ids' sum (independent recompute)
    val ids = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang")).collect()
      .filter(r => lcg(r.getLong(0)) % 8 == 0)
    val byLang = ids.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(0)).sum)
    a.foreach(r => assert(r(3) == byLang(r.head.asInstanceOf[String])))
  }

  test("q306: the three splits partition the corpus at ~80/10/10") {
    val rows = ExtensionQueries71.q306_train_test_split(spark, dir).collect()
    val total = graft.core.Tables.documents(spark, dir).count()
    assert(rows.map(_.getLong(2)).sum == total, "splits must cover every doc once")
    val bySplit = rows.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(math.abs(bySplit("train").toDouble / total - 0.8) < 0.1)
  }

  test("q307: no source ever straddles two splits; totals conserved") {
    val d = graft.core.Tables.documents(spark, dir)
    // re-derive the per-source split and check the one-split invariant
    val srcSplits = d.groupBy(col("source")).agg(min(col("doc_id")).as("k"))
      .collect().map(r => r.getString(0) -> (lcg(r.getLong(1)) % 10)).toMap
    assert(srcSplits.values.toSet.size > 1, "fixture: sources spread over deciles")
    val rows = ExtensionQueries71.q307_group_split(spark, dir).collect()
    assert(rows.map(_.getLong(1)).sum == srcSplits.size, "each source exactly once")
    assert(rows.map(_.getLong(2)).sum == d.count(), "each doc exactly once")
    val expectBySplit = srcSplits.groupBy { case (_, dec) =>
      if (dec < 8) "train" else if (dec == 8) "val" else "test"
    }.view.mapValues(_.size).toMap
    rows.foreach(r => assert(r.getLong(1) == expectBySplit(r.getString(0)),
      s"${r.getString(0)}: ${r.getLong(1)} sources != ${expectBySplit(r.getString(0))}"))
  }
}
