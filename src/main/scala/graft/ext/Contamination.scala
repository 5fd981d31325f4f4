package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data governance op that catches
  * eval-set leakage: flag corpus documents that share k-token shingles with
  * a benchmark/eval set (the n-gram-overlap method used by the major LLM
  * data pipelines).
  *
  * Scale posture: the eval side is small by nature (benchmarks are
  * thousands of docs; the corpus is billions) — its distinct shingle-hash
  * set is BROADCAST, so the corpus side is one scan + per-row explode and
  * the only shuffle is the per-doc overlap count (8-byte doc-id key,
  * map-side combinable). Shingles participate as polyhash longs, same as
  * the dedup family ([[Dedup.shingleHashes]]).
  */
object Contamination {

  /** Per-corpus-doc overlap with the eval set's shingle universe: one row
    * per corpus doc sharing ≥ 1 distinct k-shingle, with the shared count,
    * the doc's own distinct-shingle count, and the overlap fraction.
    */
  def overlap(corpus: DataFrame, evalSet: DataFrame, idCol: String,
      text: Column, k: Int): DataFrame = {
    val evalSh = evalSet.filter(size(TextAnalysis.tokens(text)) >= k)
      .select(explode(array_distinct(Dedup.shingleHashes(text, k))).as("sh"))
      .distinct()
    // n_shingles rides along through the explode and the groupBy key so the
    // corpus shingle pass runs ONCE and the only shuffle is the per-doc
    // count — no second scan, no corpus-wide size join
    corpus.filter(size(TextAnalysis.tokens(text)) >= k)
      .select(col(idCol).as("id"), array_distinct(Dedup.shingleHashes(text, k)).as("shs"))
      .select(col("id"), size(col("shs")).cast("long").as("n_shingles"),
        explode(col("shs")).as("sh"))
      .join(broadcast(evalSh), Seq("sh"))
      .groupBy(col("id"), col("n_shingles")).agg(count(lit(1)).as("n_shared"))
      .select(col("id"), col("n_shared"), col("n_shingles"),
        (col("n_shared").cast("double") / col("n_shingles")).as("overlap_frac"))
  }
}
