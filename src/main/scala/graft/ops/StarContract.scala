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

    // Per-half-round shape (round-18 optimization): the neighborhood
    // minimum rides a node-partitioned window over the symmetric edge
    // frame instead of a groupBy + join-back — the min is attached to
    // every (u, v) row in the SAME exchange that grouped it, removing
    // the aggregate exchange and both join exchanges per half-round
    // (measured at sf0.1: 14 exchanges → 8 per round pair). The window
    // is always partitioned by `u` (never partition-less), and the
    // small-star's per-u self edge (u, m) collapses through the closing
    // `canon().distinct()` exactly as the old per-group row did.
    val wU = org.apache.spark.sql.expressions.Window.partitionBy("u")
    var e = canon(edges.select(col("src").cast("long").as("u"),
      col("dst").cast("long").as("v"))).localCheckpoint(true)
    var prev: DataFrame = null
    for (_ <- 1 to rounds) {
      prev = e
      // large-star over the full (symmetric) neighborhood
      val s = sym(e).withColumn("m", least(col("u"), min(col("v")).over(wU)))
      val large = canon(
        s.filter(col("v") > col("u"))
          .select(col("v").as("u"), col("m").as("v")))
      // small-star over the strictly-smaller neighborhood (+ self)
      val down = sym(large).filter(col("v") < col("u"))
        .withColumn("m", min(col("v")).over(wU))
      val small = canon(
        down.select(col("v").as("u"), col("m").as("v"))
          .union(down.select(col("u"), col("m").as("v"))))
      e = small.localCheckpoint(true)
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
