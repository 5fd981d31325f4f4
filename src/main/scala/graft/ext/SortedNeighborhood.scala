package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.DenseIds

/** Sorted-neighborhood method (SNM) — the classic sort-based blocking
  * scheme for entity resolution / near-dup detection (Hernández &
  * Stolfo 1995): sort the corpus by a blocking key, then compare only
  * rows within a fixed rank distance `w`. Candidate volume is exactly
  * `w·n` — LINEAR in the corpus, against the quadratic all-pairs — and
  * the sliding window needs no similarity structure at all (it blocks
  * on ANY total order), which is why it survives where LSH's
  * set/vector requirements don't apply.
  *
  * Scale shape: the global rank comes from [[graft.ops.DenseIds]]
  * (range-repartition + per-partition windows + broadcast offsets),
  * NEVER a single-reducer global window; the window itself is an
  * EQUI-join — each row fans out to its `w` successor ranks via one
  * `explode(sequence)` and joins on the target rank — so the whole pass
  * is one range shuffle plus one `w·n`-row hash join. No inequality
  * join, no per-partition boundary replication to hand-maintain.
  *
  * The method's known blind spot — near-dups whose keys sort far apart
  * — is the reason the literature runs MULTIPLE passes with independent
  * keys and unions the candidates; callers compose passes with
  * `union`/`distinct` (see q117).
  */
object SortedNeighborhood {

  /** Candidate pairs within rank distance 1..w of the total order given
    * by `order` (which MUST be a total order — include a unique id as
    * the last key — or ranks, and therefore candidates, are
    * nondeterministic). Output: (id_a, id_b, rank_dist) where id_a/id_b
    * are the `idCol` values of the rank-earlier/rank-later row.
    */
  def candidatePairs(df: DataFrame, idCol: String, w: Int,
      nPartitions: Int, order: Column*): DataFrame = {
    require(w >= 1, s"window w >= 1, got $w")
    val ranked = DenseIds.withDenseId(df, "__rank", nPartitions, order: _*)
      .select(col(idCol), col("__rank"))
    val probes = ranked
      .select(col(idCol).as("id_a"), col("__rank").as("__ra"))
      .withColumn("__rank", explode(sequence(col("__ra") + 1L, col("__ra") + w.toLong)))
    probes
      .join(ranked.withColumnRenamed(idCol, "id_b"), "__rank")
      .select(col("id_a"), col("id_b"), (col("__rank") - col("__ra")).as("rank_dist"))
  }
}
