package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components by alternating large-star / small-star
  * contraction — Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii,
  * "Connected Components in MapReduce and Beyond" (SoCC 2014). The
  * scale-proof alternative to plain min-label propagation (q42's
  * cluster decision, `ext/Dedup`): label propagation needs DIAMETER
  * rounds, star contraction provably converges in O(log n) — on a
  * 100 TB edge set the difference between a path-shaped component
  * taking thousands of rounds and ~30.
  *
  *  - large-star(u): connect every neighbor v > u to m(u) =
  *    min(Γ(u) ∪ {u}).
  *  - small-star(u): connect every neighbor v < u, and u itself, to
  *    m(u) = min(Γ<(u) ∪ {u}).
  *
  * Each half-round is ONE neighborhood-min aggregate plus ONE
  * co-partitioned equi-join on the node key — no broadcasts of
  * anything proportional to |V|, no windows. The edge frame is
  * `localCheckpoint`ed once per round (the k-core/LPA economics:
  * every round's frame feeds two consumers — the next round and the
  * convergence diff — so lineage must truncate eagerly or the plan
  * re-executes per branch).
  *
  * Output: (id, comp, converged) — comp is the component's minimum
  * node id; `converged` is TRUE iff the last two rounds produced
  * identical assignments (the caller-visible certificate that the
  * round budget sufficed, same contract as `ops/KCore` / `ops/
  * LabelProp`).
  */
object StarContract {

  /** @param edges undirected edge list (src, dst), any orientation,
    *              self-loops ignored
    * @param nodes (id) — nodes absent from `edges` come out as
    *              singleton components
    * @param rounds large+small round pairs to run (O(log n) needed;
    *               measured on the co-purchase graph: fixpoint by
    *               round 3 at sf0.01 and sf0.1 — see PLANS.md)
    */
  def run(edges: DataFrame, nodes: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"need at least one round, got $rounds")
    val spark = edges.sparkSession
    // canonical undirected edge set, smaller endpoint first
    def canon(e: DataFrame): DataFrame = e
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .distinct()
    def sym(e: DataFrame): DataFrame =
      e.union(e.select(col("v").as("u"), col("u").as("v")))

    // Per-half-round shape (round-19, verdict task #2): the r18 form
    // attached the neighborhood minimum with a `Window.partitionBy(u)`
    // over the symmetric edge frame — fewest exchanges, but it ships
    // EVERY (u, v) row of the hottest node into one task and sorts it,
    // and AQE's skew handling cannot split windows (guide §2.5). On a
    // power-law graph at the 100 TB posture the max-degree node is a
    // straggler by construction, and large-star visits full
    // neighborhoods. So the min now comes from a groupBy aggregate —
    // partial map-side combine means each map task ships ≤ 1 row per
    // node, no skew possible in the aggregate — and is attached back
    // with a co-partitioned `shuffle_hash` equi-join on u (the
    // PageRank/LabelProp discipline): the build side is the |V|-row min
    // frame (already hash(u)-partitioned by its own aggregate, no extra
    // exchange), the probe side streams without sorting, and a skewed
    // probe partition is exactly the shape AQE's skew-join splitter
    // handles at runtime. Exchange count stays well below the r17
    // groupBy+join-back form (6 vs 14 per round pair — the join reuses
    // the aggregate's partitioning) and shuffle records return to the
    // map-combined level (the window shipped whole neighborhoods).
    // `large` feeds two consumers (the small-star min and its join), so
    // it is eagerly checkpointed once per round — the KCore economics.
    def nbrMin(s: DataFrame): DataFrame =
      s.groupBy(col("u")).agg(min(col("v")).as("mn"))
    def attach(s: DataFrame, mins: DataFrame): DataFrame =
      s.join(mins.hint("shuffle_hash"), Seq("u"))
    var e = canon(edges.select(col("src").cast("long").as("u"),
      col("dst").cast("long").as("v"))).transform(graft.core.Ckpt.eager)
    var prev: DataFrame = null
    for (_ <- 1 to rounds) {
      prev = e
      // large-star over the full (symmetric) neighborhood
      val se = sym(e)
      val s = attach(se, nbrMin(se)).withColumn("m", least(col("u"), col("mn")))
      val large = canon(
        s.filter(col("v") > col("u"))
          .select(col("v").as("u"), col("m").as("v")))
        .transform(graft.core.Ckpt.eager)
      // small-star over the strictly-smaller neighborhood (+ self);
      // the old per-row (u, m) self-edge branch collapses to the
      // aggregate's one row per u — identical after canon().distinct(),
      // and the union's mins subtree is the join's build side, so its
      // exchange is reused, not recomputed
      val down = sym(large).filter(col("v") < col("u"))
      val mins2 = nbrMin(down)
      val small = canon(
        attach(down, mins2).select(col("v").as("u"), col("mn").as("v"))
          .union(mins2.select(col("u"), col("mn").as("v"))))
      e = small.transform(graft.core.Ckpt.eager)
    }
    // after contraction E is a star forest: every edge is (member, root)
    val assign = assignment(nodes, e)
    val prevAssign = assignment(nodes, prev)
    val diffs = assign.as("a").join(prevAssign.as("b"), Seq("id"))
      .filter(col("a.comp") =!= col("b.comp")).limit(1).count()
    assign.withColumn("converged", lit(diffs == 0))
  }

  /** Canonical star edges are (root = min endpoint, member); roots and
    * isolated nodes fall through the left join to themselves.
    */
  private def assignment(nodes: DataFrame, stars: DataFrame): DataFrame =
    nodes.select(col("id").cast("long").as("id"))
      .join(stars.select(col("v").as("id"), col("u").as("root")), Seq("id"), "left")
      .groupBy("id").agg(min(col("root")).as("mr"))
      .select(col("id"), coalesce(col("mr"), col("id")).as("comp"))
}
