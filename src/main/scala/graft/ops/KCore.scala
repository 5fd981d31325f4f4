package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by synchronous peeling — the fourth member of
  * the graph family (PageRank = global importance, connected components
  * = reachability, triangles = local density, k-core = engagement
  * shell): repeatedly remove every node whose degree in the SURVIVING
  * subgraph is < k, until a fixpoint. The k-core is the standard
  * "dense nucleus" extractor for co-occurrence graphs; `peel_round`
  * (the round a node was removed) is its coreness layer.
  *
  * Synchronous peeling (all sub-k nodes removed simultaneously per
  * round) is the form that distributes: each round is one
  * degree-aggregate shuffle plus two anti-joins on node keys — no
  * priority queue, no sequential dependence inside a round, and the
  * result is independent of any tie-breaking, so an unrolled ANSI-SQL
  * mirror replays it bit-exactly. The round budget is FIXED; the loop
  * exits early at the first round that peels nothing (the fixpoint —
  * every later round is provably a no-op, so the output is identical to
  * running the full budget; the probe is a bounded limit-1 `isEmpty`,
  * the [[Bfs]] discipline, never a data collect). The emitted
  * `converged` flag certifies that the last round peeled nothing, i.e.
  * the fixpoint was reached within the round budget. Nodes that lose
  * their LAST edge are peeled through the surviving-node frame (a degree
  * aggregate derived from edges alone would silently never see them).
  *
  * Every round's surviving node and edge frames are EAGERLY
  * `localCheckpoint`ed: each is consumed twice (the next round's degree
  * aggregate AND its own filtered successor), so un-materialized
  * lineage would recompute along both branches and the replay factor
  * would double per round — the same exponential the oracle's
  * `AS MATERIALIZED` guards against on the DuckDB side. Eager
  * checkpoints cost one small job per round on an ever-shrinking graph
  * and hold plan depth at O(1).
  */
object KCore {

  /** Peel to the k-core in `rounds` synchronous rounds. Output, one row
    * per ORIGINAL node: (node, deg0, peel_round, in_core, core_deg,
    * converged) — peel_round 0 for core members, core_deg the node's
    * degree within the final core (0 for peeled nodes), `converged`
    * TRUE iff the final round peeled nothing.
    *
    * Round economics (round-18 optimization, measured at sf0.1): each
    * round's peel frame feeds THREE consumers (the node anti-join, the
    * two edge anti-joins, and the final peeled union), so it is eagerly
    * `localCheckpoint`ed — one degree pass per round instead of one per
    * consumer. An empty peel is the fixpoint: degrees can never change
    * again, every later round provably peels nothing, so the loop exits
    * early with the identical output (`converged` still certifies the
    * budget — an empty peel at round r < rounds IS "the last round
    * peeled nothing"). The exit test is a limit-1 `isEmpty` against the
    * just-materialized blocks, the [[Bfs]] discipline. At sf0.1 the q107
    * graph reaches its fixpoint in round 3 of a 12-round budget: rounds
    * 4-12 were 18 no-op checkpoint jobs this removes.
    */
  def decompose(edges: DataFrame, aCol: String, bCol: String, k: Int,
      rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, s"k=$k rounds=$rounds")
    val canon = edges
      .select(least(col(aCol), col(bCol)).as("u"), greatest(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .transform(graft.core.Ckpt.eager) // 2 consumers (deg0 + round 1); edge build runs once

    def degrees(e: DataFrame): DataFrame =
      e.select(col("u").as("node")).unionAll(e.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))

    val deg0 = degrees(canon)

    var curEdges = canon
    var curNodes = deg0.select(col("node"))
    var peeled: DataFrame = null
    var lastPeelCount: DataFrame = null
    var r = 1
    var fixpoint = false
    while (r <= rounds && !fixpoint) {
      // degree WITHIN the surviving subgraph, 0 for survivors that lost
      // every edge (they must still be peelable — hence the node frame)
      val deg = curNodes.join(degrees(curEdges), Seq("node"), "left")
        .select(col("node"), coalesce(col("deg"), lit(0L)).as("deg"))
      val peel = deg.filter(col("deg") < k).select(col("node"))
        .withColumn("peel_round", lit(r))
        .transform(graft.core.Ckpt.eager) // 3 consumers + the early-exit probe
      peeled = if (peeled == null) peel else peeled.unionAll(peel)
      fixpoint = peel.isEmpty
      if (fixpoint) {
        // nothing peeled: node/edge frames are already final, and the
        // "last round" (this one, and every hypothetical one after it)
        // peeled zero — the converged certificate holds by construction
        lastPeelCount = peel.agg(count(lit(1)).as("__last_peeled"))
      } else {
        curNodes = curNodes.join(peel, Seq("node"), "left_anti").transform(graft.core.Ckpt.eager)
        curEdges = curEdges
          .join(peel.select(col("node").as("u")), Seq("u"), "left_anti")
          .join(peel.select(col("node").as("v")), Seq("v"), "left_anti")
          .select(col("u"), col("v"))
          .transform(graft.core.Ckpt.eager)
        if (r == rounds) lastPeelCount = peel.agg(count(lit(1)).as("__last_peeled"))
      }
      r += 1
    }

    val coreDeg = degrees(curEdges)
    deg0.select(col("node"), col("deg").as("deg0"))
      .join(peeled, Seq("node"), "left")
      .join(coreDeg.select(col("node"), col("deg").as("__cd")), Seq("node"), "left")
      .crossJoin(broadcast(lastPeelCount)) // 1-row scalar fan-out
      .select(col("node"), col("deg0"),
        coalesce(col("peel_round"), lit(0)).as("peel_round"),
        (coalesce(col("peel_round"), lit(0)) === 0).as("in_core"),
        coalesce(col("__cd"), lit(0L)).as("core_deg"),
        (col("__last_peeled") === 0L).as("converged"))
  }
}
