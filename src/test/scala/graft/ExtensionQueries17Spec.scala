package graft

import org.apache.spark.sql.functions._
import graft.queries.ExtensionQueries17

/** q145 (dyadic recency decay), q146 (Gini–Simpson diversity), q147
  * (hard-negative mining).
  */
class ExtensionQueries17Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"
  private val DayNs = 86400000000000L

  test("q145: power-of-two decay weights are exact and anchored to the latest day") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_decay").toString
    // user 1: $1.00 on day 0 (age 2 → weight 2^27) and $2.00 on day 2
    // (age 0 → 2^29); user 2: $5.00 beyond the horizon (clamps to 1... but
    // horizon is 29 days and spread is 2 — plant an in-horizon case only)
    Seq(
      (1L, 1000L, 1L, "purchase", 1.00, "{}"),
      (2L, 2 * DayNs, 1L, "purchase", 2.00, "{}"),
      (3L, 2 * DayNs + 5L, 2L, "purchase", 5.00, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = ExtensionQueries17.q145_decayed_value(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("raw_cents"), r.getAs[Long]("decayed_scaled"))).toMap
    assert(rows(1L) == ((300L, 100L * (1L << 27) + 200L * (1L << 29))))
    assert(rows(2L) == ((500L, 500L * (1L << 29))))
  }

  test("q145: decayed ranking reorders users vs raw spend when recency differs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_decay2").toString
    // user 1 spent MORE but LONG ago; user 2 less but today → decayed flips
    Seq(
      (1L, 1000L, 1L, "purchase", 100.00, "{}"), // day 0, age 20
      (2L, 20 * DayNs, 2L, "purchase", 10.00, "{}")) // day 20, age 0
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = ExtensionQueries17.q145_decayed_value(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("raw_cents"), r.getAs[Long]("decayed_scaled"))).toMap
    assert(rows(1L)._1 > rows(2L)._1, "user 1 leads on raw spend")
    assert(rows(1L)._2 < rows(2L)._2, "user 2 leads once recency-weighted")
  }

  test("q146: a planted one-source language scores 0; an even split scores 1/2") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_div").toString
    val docs =
      (1 to 4).map(i => (i.toLong, s"text $i", "mono", "src_a", 10L)) ++
      (5 to 6).map(i => (i.toLong, s"text $i", "duo", "src_a", 10L)) ++
      (7 to 8).map(i => (i.toLong, s"text $i", "duo", "src_b", 10L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = ExtensionQueries17.q146_source_diversity(spark, dir).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("gini_simpson_ppm"), r.getAs[String]("dominant_source"),
          r.getAs[Long]("dominant_share_ppm"))).toMap
    assert(rows("mono") == ((0L, "src_a", 1000000L))) // one scrape in a trench coat
    assert(rows("duo")._1 == 500000L) // 1 - 2·(1/2)² = 1/2
    assert(rows("duo")._3 == 500000L)
  }

  test("q147: negatives stay below the band, ranked by similarity, probes bounded") {
    val rows = ExtensionQueries17.q147_hard_negatives(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("cos") < ExtensionQueries17.PositiveBand))
    assert(rows.forall(_.getAs[Long]("probe_id") < 20L))
    // within a probe, rank order == descending cosine
    rows.groupBy(_.getAs[Long]("probe_id")).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos")).toSeq
      assert(byRank == byRank.sorted.reverse)
      assert(rs.length <= 5)
    }
  }

  test("q147: hard negatives are disjoint from the q30 positives above the band") {
    val negs = ExtensionQueries17.q147_hard_negatives(spark, sfTiny).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("cand_id"))).toSet
    val posPairs = graft.ext.Similarity.bruteForceTopK(
        graft.core.Tables.embeddings(spark, sfTiny), "vec_id", "embedding",
        col("vec_id") < 20, 5)
      .filter(col("cos") >= ExtensionQueries17.PositiveBand)
      .collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("cand_id"))).toSet
    assert(negs.intersect(posPairs).isEmpty)
  }
}
