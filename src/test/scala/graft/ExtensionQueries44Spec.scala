package graft

import org.apache.spark.sql.functions._
import graft.queries.ExtensionQueries44

/** Property pins for the round-9 thirty-second batch (cross-engine
  * equality is the DuckDB oracle's job — these assert operator
  * SEMANTICS: leakage zero for group folds, out-of-fold exclusion,
  * reciprocity identities).
  */
class ExtensionQueries44Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  // ------------------------------------------ q225 fold leakage

  test("q225: group folds never straddle; event folds leak on real data") {
    val out = ExtensionQueries44.q225_groupkfold_leakage(spark, sfTiny)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(out("group_level")._1 == 0L)
    // multi-event users inevitably straddle event-level folds
    assert(out("event_level")._1 > 0L)
    out.values.foreach { case (_, mn, mx) => assert(mn >= 0 && mn <= mx) }
  }

  // ------------------------------------------ q226 target encoding

  test("q226: a user's own fold never contributes to its encoding") {
    val out = ExtensionQueries44.q226_target_encoding(spark, sfTiny).collect()
    assert(out.nonEmpty)
    // reconstruct per-nation totals: every fold's oof_n + its own size = nn
    val users = graft.core.Tables.events(spark, sfTiny)
      .groupBy(col("user_id"))
      .agg(when(sum(when(col("event_type") === "purchase", 1L)
        .otherwise(0L)) >= 14L, 1L).otherwise(0L).as("heavy"))
      .select((col("user_id") % 5).as("fold"),
        (col("user_id") % 7).as("nation"), col("heavy"))
      .collect()
    val byNation = users.groupBy(_.getLong(1))
    out.foreach { r =>
      val (nation, fold) = (r.getLong(0), r.getLong(1))
      val all = byNation(nation)
      val inFold = all.filter(_.getLong(0) == fold)
      assert(r.getLong(2) == all.length - inFold.length, s"oof_n $r")
      val oofHits = all.map(_.getLong(2)).sum - inFold.map(_.getLong(2)).sum
      assert(r.getLong(3) == oofHits, s"oof_hits $r")
      if (r.getLong(2) > 0)
        assert(r.getLong(4) == oofHits * 1000000L / r.getLong(2))
    }
  }

  // ------------------------------------------ q227 mutual kNN

  test("q227: reciprocity bounds; a 2-point shard is perfectly mutual") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q227").toString
    // label 0: two vectors -> each other's 1-NN -> 100% mutual
    // label 1: hub geometry - vectors near-orthogonal except a hub
    val rows = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.9f, 0.1f, 0.0f, 0.0f), 0),
      (3L, Array(1.0f, 0.0f, 0.0f, 0.0f), 1),
      (4L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1),
      (5L, Array(0.0f, 0.0f, 1.0f, 0.0f), 1),
      (6L, Array(0.5f, 0.5f, 0.5f, 0.1f), 1))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = ExtensionQueries44.q227_mutual_knn(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(0L) == ((2L, 2L, 1000000L)))
    // label 1 has 4 vectors, k=3 -> COMPLETE directed graph -> all mutual
    assert(out(1L) == ((12L, 12L, 1000000L)))
    out.values.foreach { case (e, m, ppm) =>
      assert(m <= e && ppm <= 1000000L)
    }
  }

  test("q227: real-data reciprocity is well-formed per label") {
    val out = ExtensionQueries44.q227_mutual_knn(spark, sfTiny).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) == r.getLong(2) * 1000000L / r.getLong(1))
    }
  }
}
