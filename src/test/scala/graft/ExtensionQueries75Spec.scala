package graft

import graft.queries.ExtensionQueries75

/** Semantics pins for the privacy release-audit batch (q317-q319):
  * every statistic recomputes driver-side from first principles at
  * sf0.001, and the structural invariants (conservation, ladder
  * monotonicity) hold.
  */
class ExtensionQueries75Spec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def docs() = graft.core.Tables.documents(spark, dir)
    .select("doc_id", "lang", "source", "n_chars").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("q317: l histogram equals a driver recompute and conserves the corpus") {
    val ds = docs()
    val byGroup = ds.groupBy(d => (d._2, d._4 / 100))
    val ref = byGroup.values
      .map(g => (g.map(_._3).distinct.size.toLong, g.size.toLong))
      .groupBy(_._1).map { case (l, gs) =>
        l -> (gs.size.toLong, gs.map(_._2).sum, gs.map(_._2).min)
      }
    val rows = ExtensionQueries75.q317_l_diversity(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows == ref)
    assert(rows.values.map(_._2).sum == ds.length.toLong, "doc conservation")
    assert(rows.keys.forall(_ >= 1))
  }

  test("q318: t-closeness equals the exact driver EMD; uniform corpus -> t == 0") {
    val ds = docs()
    val m = 10
    val n = ds.length.toLong
    val globalCum = {
      val c = Array.fill(m)(0L)
      ds.foreach(d => c((d._4 % m).toInt) += 1)
      c.scanLeft(0L)(_ + _).drop(1)
    }
    val ref = ds.groupBy(d => (d._2, d._3)).map { case ((lang, src), g) =>
      val ng = g.size.toLong
      val c = Array.fill(m)(0L)
      g.foreach(d => c((d._4 % m).toInt) += 1)
      val cum = c.scanLeft(0L)(_ + _).drop(1)
      val gap = (0 until m - 1)
        .map(j => math.abs(cum(j) * n - globalCum(j) * ng)).sum
      (lang, src) -> (ng, gap * 1000000L / ((m - 1) * ng * n))
    }
    val rows = ExtensionQueries75.q318_t_closeness(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows == ref)
    // a group whose distribution IS the global one has t = 0; the whole
    // corpus as one group is that by construction — pin the identity on
    // a synthetic single-group frame
    import org.apache.spark.sql.functions._
    val one = graft.core.Tables.documents(spark, dir)
      .withColumn("lang", lit("all")).withColumn("source", lit("all"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_tc_").toString
    one.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val t0 = ExtensionQueries75.q318_t_closeness(spark, tmp).collect()
    assert(t0.length == 1 && t0.head.getLong(3) == 0L,
      s"single-group corpus must have t_ppm = 0, got ${t0.toSeq}")
  }

  test("q319: ladder is monotone and the suppressed level is (lang, source) only") {
    val ds = docs()
    val rows = ExtensionQueries75.q319_generalization_ladder(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.keySet == Set(0L, 100L, 500L, 1000L))
    // coarser buckets can only merge groups: risk mass never increases
    // going 100 -> 500 -> 1000 -> suppressed
    val ladder = Seq(100L, 500L, 1000L, 0L).map(rows)
    ladder.sliding(2).foreach { case Seq(fine, coarse) =>
      assert(coarse._3 <= fine._3,
        s"docs-at-risk must not grow under generalization: $rows")
      assert(coarse._1 <= fine._1, "group count must not grow")
    case _ => }
    // suppressed level = exactly the (lang, source) partition
    val langSrc = ds.map(d => (d._2, d._3)).distinct.size.toLong
    assert(rows(0L)._1 == langSrc)
    // driver recompute of one interior level (w=500)
    val g500 = ds.groupBy(d => (d._2, d._3, d._4 / 500)).values.map(_.size.toLong)
    assert(rows(500L) == (
      g500.size.toLong,
      g500.count(_ < 5).toLong,
      g500.filter(_ < 5).sum))
  }
}
