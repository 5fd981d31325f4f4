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

  /** q83: hot-key detection via a mergeable Misra-Gries summary (k=64).
    * The scale story is the whole point: the keys NEVER shuffle — each
    * task folds its partition into a 64-entry summary and only summaries
    * cross the wire (vs q50's full wordcount, which shuffles the entire
    * key universe). Input is a synthesized referrer-domain stream over
    * the lineitem scan (the q12 synthesize-from-scan precedent; the
    * documents corpus has only 31 distinct tokens, so token heavy-hitters
    * would degenerate to an exact 64-slot count): ~70% of rows hit 5 hot
    * domains, the rest spread over a ~30k-domain tail. Output = survivors
    * above the n/k noise floor — MG guarantees exactly the hot five
    * (est ∈ [true − n/k, true], every key with true > n/k present; tail
    * keys can never clear the floor), so the row set is stable even
    * though sub-threshold summary residue is order-dependent. SketchSpec
    * pins both bounds against exact counts of the same stream.
    */
  def q83_heavy_hitters(s: SparkSession, dir: String): DataFrame = {
    val mg = udaf(new Sketches.MisraGries(64))
    heavyHitterStream(s, dir)
      .agg(mg(col("domain")).as("hh"), count(lit(1)).as("n"))
      .select(explode(col("hh")).as(Seq("domain", "est")), col("n"))
      .filter(col("est") > col("n") / 64)
      .orderBy(col("est").desc, col("domain"))
  }

  /** The q83 fixture stream, shared with SketchSpec's exact recount:
    * deterministic head/tail mixture keyed off the orderkey hash.
    */
  private[graft] def heavyHitterStream(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).select(
      when(pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(10)) < 7,
          concat(lit("hot-"), pmod(col("l_orderkey"), lit(5))))
        .otherwise(concat(lit("tail-"), pmod(xxhash64(col("l_partkey"), col("l_orderkey")), lit(30000))))
        .as("domain"))

  /** q84: deterministic per-group bottom-k sample — the exact-tier member
    * of this file (full DuckDB oracle): 10 lineitem rows per returnflag
    * chosen by smallest md5 of the (orderkey, linenumber) pair. md5 is
    * bit-identical across engines, so the "random" sample is a pure
    * function of the data — re-runs, retries, and other engines pick the
    * SAME rows (the property a reproducible training-data subsample
    * needs). The rank-≤-k filter directly under the window lets Spark
    * plan WindowGroupLimit: each map task pre-prunes to ≤10 rows per
    * group before the shuffle, so the window never sees the full table.
    */
  def q84_bottomk_sample(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(s, dir)
    val h = md5(concat(col("l_orderkey").cast("string"), lit("-"),
      col("l_linenumber").cast("string")))
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(h, col("l_orderkey"), col("l_linenumber"))
    li.select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        h.as("sample_key"),
        row_number().over(w).as("sample_rank"))
      .filter(col("sample_rank") <= 10)
      .orderBy(col("l_returnflag"), col("sample_rank"))
  }

  val q84Sql: String =
    """SELECT * FROM (
      |  SELECT l_returnflag, l_orderkey, l_linenumber,
      |    md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)) AS sample_key,
      |    row_number() OVER (
      |      PARTITION BY l_returnflag
      |      ORDER BY md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)),
      |        l_orderkey, l_linenumber) AS sample_rank
      |  FROM lineitem
      |) WHERE sample_rank <= 10
      |ORDER BY l_returnflag, sample_rank""".stripMargin

  /** q85: set-overlap estimation from KMV sketches — "how many parts do
    * the two supplier halves share?" answered from two 1024-hash
    * sketches instead of a distinct-join of the full sets. Each side
    * folds to its bottom-1024 xxhash64 set (no key shuffle, summaries
    * only); union/intersection/Jaccard estimates are then pure ARRAY
    * expressions over the two sketch rows (Beyer et al.: the union
    * sketch is the bottom-k of the merged sketches; ρ = the fraction of
    * it present in both sides). Deterministic — bottom-k of a hash set
    * is order-free. SketchSpec bounds all five estimates against exact.
    */
  def q85_set_overlap_sketch(s: SparkSession, dir: String): DataFrame = {
    val k = 1024
    val kmv = udaf(new Sketches.KmvSketch(k))
    val li = Tables.lineitem(s, dir)
    val sk = li.select(
        pmod(col("l_suppkey"), lit(2)).as("side"),
        xxhash64(col("l_partkey")).bitwiseAND(lit(Long.MaxValue)).as("h"))
      .groupBy(col("side")).agg(kmv(col("h")).as("sk"))
    val a = sk.filter(col("side") === 0).select(col("sk").as("ska"))
    val b = sk.filter(col("side") === 1).select(col("sk").as("skb"))
    val two63 = lit(9.223372036854776e18)
    def est(sketch: org.apache.spark.sql.Column) =
      (lit(k - 1).cast("double") * two63) / element_at(sketch, k).cast("double")
    a.crossJoin(b) // 1×1: the two sketch rows
      .select(
        slice(array_sort(array_union(col("ska"), col("skb"))), 1, k).as("u"),
        col("ska"), col("skb"))
      .select(
        est(col("ska")).as("est_a"),
        est(col("skb")).as("est_b"),
        est(col("u")).as("est_union"),
        (size(array_intersect(col("u"), array_intersect(col("ska"), col("skb"))))
          .cast("double") / size(col("u"))).as("jaccard_est"))
      .withColumn("est_inter", col("jaccard_est") * col("est_union"))
  }

  val queries: Map[String, Q] = Map(
    "q81_hll_distinct" -> (q81_hll_distinct _),
    "q82_quantile_sketch" -> (q82_quantile_sketch _),
    "q83_heavy_hitters" -> (q83_heavy_hitters _),
    "q84_bottomk_sample" -> (q84_bottomk_sample _),
    "q85_set_overlap_sketch" -> (q85_set_overlap_sketch _)
  )

  val oracle: Map[String, String] = Map(
    "q84_bottomk_sample" -> q84Sql
  )
}
