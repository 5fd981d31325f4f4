package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{CacheScope, Tables}
import graft.ops.Sketches

/** Approximate-sketch tier (round-4 verdict ask #7). These two queries are
  * the ONLY members of the surface with no DuckDB oracle, by design: a
  * sketch estimate can never hash-match a different engine's sketch, so
  * the driver records rows-only checks here while SketchSpec pins the
  * actual contract — relative/rank error bounds against the exact tier
  * (q36 distinct counts, q08/q61 exact percentiles) at sf0.1.
  *
  * Both queries deliberately exercise MERGE, not just estimate: the global
  * row is computed by unioning the per-group sketches, never by a second
  * scan — the property that makes sketches the right tool at 100 TB
  * (per-shard/per-day sketches fold into any rollup without re-reading
  * history). The per-group sketch frame is scanned by both the group
  * branch and the ALL branch of one union, so it is [[CacheScope.scoped]]
  * — one corpus scan per query, released after the consuming action.
  */
object SketchQueries {

  type Q = (SparkSession, String) => DataFrame

  /** q81: HLL distinct parts per returnflag + a merged ALL row. One scan
    * builds the per-group sketches (DataSketches HLL, lgK=12 → ~1.6%
    * relative standard error); the ALL row is `hll_union_agg` over the ≤3
    * group sketch rows — a driver-sized second aggregate, zero rescans.
    * HLL registers are max-merged, so estimates are order-independent and
    * deterministic run to run.
    */
  def q81_hll_distinct(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val perGroup = CacheScope.scoped(
      li.groupBy(col("l_returnflag"))
        .agg(hll_sketch_agg(col("l_partkey"), lit(12)).as("sk"),
          count(lit(1)).as("n_rows")))
    val unioned = perGroup
      .agg(hll_union_agg(col("sk")).as("sk"), sum(col("n_rows")).as("n_rows"))
      .select(lit("ALL").as("l_returnflag"), col("sk"), col("n_rows"))
    perGroup.unionByName(unioned)
      .select(col("l_returnflag"),
        hll_sketch_estimate(col("sk")).as("n_parts_est"),
        col("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  /** q82: mergeable quantile sketch of extended price per returnflag + a
    * merged ALL row. Per-group GK sketches (eps=0.01) are emitted as
    * bytes once; querying a stored sketch is the merge aggregator over a
    * single row (group branch), and the ALL row folds the per-group
    * SKETCHES (rank error ≤ 2·eps·n after merge) — the stored-sketch
    * rollup path, not a rescan.
    */
  def q82_quantile_sketch(s: SparkSession, dir: String): DataFrame = {
    val probs = Seq(0.5, 0.95, 0.99)
    val skAgg = udaf(new Sketches.QuantileSketchBytes(Sketches.DefaultEps))
    val mergeQ = udaf(new Sketches.QuantileSketchMergeQuery(Sketches.DefaultEps, probs))
    val li = Tables.lineitem(s, dir)
    val perGroup = CacheScope.scoped(
      li.groupBy(col("l_returnflag"))
        .agg(skAgg(col("l_extendedprice")).as("sk"), count(lit(1)).as("n_rows")))
    val grouped = perGroup.groupBy(col("l_returnflag"))
      .agg(mergeQ(col("sk")).as("qs"), first(col("n_rows")).as("n_rows"))
    val unioned = perGroup
      .agg(mergeQ(col("sk")).as("qs"), sum(col("n_rows")).as("n_rows"))
      .select(lit("ALL").as("l_returnflag"), col("qs"), col("n_rows"))
    grouped.unionByName(unioned)
      .select(col("l_returnflag"),
        col("qs").getItem(0).as("p50_est"),
        col("qs").getItem(1).as("p95_est"),
        col("qs").getItem(2).as("p99_est"),
        col("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  val queries: Map[String, Q] = Map(
    "q81_hll_distinct" -> (q81_hll_distinct _),
    "q82_quantile_sketch" -> (q82_quantile_sketch _)
  )
}
