package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.PrefixScan
import graft.queries.ExtensionQueries23

/** Property pins for the round-9 eleventh batch (cross-engine equality is
  * the DuckDB oracle's job — these assert operator SEMANTICS: exact
  * quantization, prefix-sum equivalence, KS supremum, histogram
  * coverage).
  */
class ExtensionQueries23Spec extends SparkSpecBase {

  private val sfTiny = "/root/testdata/sf0.001"

  // -------------------------------------------- q165 embedding drift

  test("q165: equal means → zero drift; a planted 0.5 shift reports exactly 2^19 micro") {
    import spark.implicits._
    // label 0: half means identical though values differ → drift 0
    // label 1: dim-2 mean differs by 0.5 → |floor(0.5·2^20)·10^6| = 524288000000
    val rows = Seq(
      (0L, Array(1.0f, 0.0f), 0), (2L, Array(3.0f, 0.0f), 0),
      (1L, Array(2.0f, 0.0f), 0),
      (10L, Array(1.0f, 0.0f), 1), (11L, Array(1.0f, 0.5f), 1))
    val dir = java.nio.file.Files.createTempDirectory("q165").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = ExtensionQueries23.q165_embedding_drift(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(out(0) == 0L, s"equal means must cancel exactly: $out")
    assert(out(1) == 524288000000L, s"planted half-unit shift: $out")
  }

  // ------------------------------------ PrefixScan sums (q167 engine)

  test("PrefixScan: two-phase inclusive prefix sums == the global-window spelling, both columns") {
    val c = graft.core.Tables.orders(spark, sfTiny)
      .select((col("o_orderkey") % 2).as("half"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("cents"))
      .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("half") === 1, 1L).otherwise(0L)).as("cb"))
    val twoPhase = PrefixScan.prefixSumsInclusive(c, 8, Seq(col("cents")),
        Seq((col("ca"), "cuma"), (col("cb"), "cumb")))
      .select(col("cents"), col("cuma"), col("cumb"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val w = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val global = c
      .withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
      .select(col("cents"), col("cuma"), col("cumb"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(twoPhase.nonEmpty && twoPhase == global)
  }

  test("q167: hand halves — KS supremum and its first attaining value") {
    import spark.implicits._
    // half 0 values {1.00, 2.00}, half 1 {2.00, 3.00}:
    // F diffs at 100/200/300 cents = 0.5 / 0.5 / 0 → ks 500000 first at 100
    val rows = Seq((2L, 1.0), (4L, 2.0), (1L, 2.0), (3L, 3.0))
    val dir = java.nio.file.Files.createTempDirectory("q167").toString
    rows.toDF("o_orderkey", "o_totalprice")
      .withColumn("o_custkey", lit(1L))
      .withColumn("o_orderdate", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = ExtensionQueries23.q167_ks_drift(spark, dir).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 500000L && r.getLong(3) == 100L, s"$r")
  }

  // --------------------------------------- q166 cluster histogram

  test("q166: the histogram covers the whole corpus — Σ size·count == corpus size") {
    val out = ExtensionQueries23.q166_cluster_histogram(spark, sfTiny).collect()
    assert(out.nonEmpty)
    val covered = out.map(r => r.getLong(0) * r.getLong(1)).sum
    val corpus = graft.queries.ExtensionQueries2.q42Corpus(spark, sfTiny).count()
    assert(covered == corpus,
      s"every doc is in exactly one cluster or singleton: $covered vs $corpus")
    // the singleton row may legitimately report 0 (fully clustered corpus);
    // every CC-derived row is a real cluster
    assert(out.filter(_.getLong(0) >= 2L).forall(_.getLong(1) >= 1L))
    // the doctored corpus must produce at least one multi-doc cluster
    assert(out.exists(r => r.getLong(0) >= 2L && r.getLong(1) >= 1L))
  }
}
