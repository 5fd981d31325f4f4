package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Common-neighbor link prediction over an undirected edge list — the
  * baseline topological score (Liben-Nowell & Kleinberg 2003): for
  * every NON-edge pair (u, v), the number of shared neighbors, plus the
  * preferential-attachment product deg(u)·deg(v) as the tiebreak-free
  * second signal. Both are exact integers, so the result replays
  * bit-for-bit in ANSI SQL.
  *
  * Scale shape: candidate pairs are wedges — two neighbor-list entries
  * of one center — so the fan-out is Σ deg(c)² over CENTERS, which a
  * hub turns quadratic. `maxCenterDegree` caps it the way q26's
  * stop-shingle cap does: centers above the cap contribute no wedges
  * (Σ deg² ≤ cap·2|E| after the cap), and because a hub is a neighbor
  * of nearly everything its wedge evidence is the least informative —
  * the same reason Adamic–Adar discounts by 1/log deg. The cap is part
  * of the operator's CONTRACT (applied identically in the oracle), not
  * a silent approximation. Everything else is equi-joins and one
  * aggregate keyed on the (u, v) pair.
  */
object LinkPredict {

  /** Non-edge pairs scored by common-neighbor count ≥ minCommon.
    * `edges` must carry (uCol, vCol) with u < v, deduplicated — the
    * co-purchase contract. Output: (id_a, id_b, n_common, pa_score),
    * id_a < id_b.
    */
  def commonNeighbors(edges: DataFrame, uCol: String, vCol: String,
      maxCenterDegree: Int, minCommon: Int): DataFrame = {
    require(maxCenterDegree >= 1, s"maxCenterDegree >= 1, got $maxCenterDegree")
    val e = edges.select(col(uCol).as("u"), col(vCol).as("v"))
    val adj = e.select(col("u").as("ctr"), col("v").as("nb"))
      .union(e.select(col("v").as("ctr"), col("u").as("nb")))
    val deg = adj.groupBy(col("ctr")).agg(count(lit(1)).as("deg"))
    val small = adj.join(deg.filter(col("deg") <= maxCenterDegree), "ctr")
    val wedges = small.as("a").join(small.as("b"),
        col("a.ctr") === col("b.ctr") && col("a.nb") < col("b.nb"))
      .select(col("a.nb").as("id_a"), col("b.nb").as("id_b"))
    val cn = wedges.groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= minCommon)
      // predict MISSING links: existing edges drop out
      .join(e, col("id_a") === col("u") && col("id_b") === col("v"), "left_anti")
    cn.join(deg.select(col("ctr").as("id_a"), col("deg").as("deg_a")), "id_a")
      .join(deg.select(col("ctr").as("id_b"), col("deg").as("deg_b")), "id_b")
      .select(col("id_a"), col("id_b"), col("n_common"),
        (col("deg_a") * col("deg_b")).as("pa_score"))
  }
}
