package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree-oriented triangle counting + local clustering coefficient —
  * the third member of the graph family ([[PageRank]],
  * `ext/Dedup.connectedComponents` are the other two). Triangle density
  * is the standard structure signal over co-occurrence graphs (here:
  * q80's co-purchase edges): high clustering separates genuine
  * communities from hub noise.
  *
  * The naive triangle join (E ⋈ E ⋈ E on shared endpoints) explodes on
  * hubs: a degree-k node contributes k² wedges. The classical fix
  * (Chiba–Nishizeki orientation, the shape every distributed triangle
  * counter uses) orients each undirected edge from its LOWER
  * (degree, id) endpoint to the higher one; every out-neighborhood then
  * has size O(√m) on any graph, the wedge join fans out
  * Σ outdeg² = O(m^1.5) worst-case instead of Σ deg², and each triangle
  * is generated exactly once (its minimum-rank vertex is the only
  * wedge apex). All stages are plain equijoin shuffles on node keys —
  * no all-pairs, nothing collected; AQE's skew split handles residual
  * hot apexes.
  *
  * Ties in degree break on node id, so the orientation — and therefore
  * the whole result — is deterministic and exactly mirrorable in SQL.
  */
object Triangles {

  /** Per-node triangle counts over an undirected edge list (endpoint
    * order irrelevant; self-loops and duplicate edges are normalized
    * away). Output: (node, deg, n_tri, cc_ppm) — cc_ppm the local
    * clustering coefficient `2·n_tri·10⁶ div (deg·(deg−1))` as an
    * exact scaled rational (0 for deg < 2).
    */
  def counts(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val canon = edges
      .select(least(col(aCol), col(bCol)).as("u"), greatest(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

    val deg = canon.select(col("u").as("node"))
      .unionAll(canon.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))

    // Orient u→v iff (deg_u, u) < (deg_v, v); carry the head's rank key
    // so the wedge join can order its two heads without re-joining deg.
    val ranked = canon
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
    val oriented = ranked.select(
      when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
        struct(col("u").as("x"), col("v").as("y"), col("dv").as("dy")))
        .otherwise(struct(col("v").as("x"), col("u").as("y"), col("du").as("dy")))
        .as("e"))
      .select(col("e.x").as("x"), col("e.y").as("y"), col("e.dy").as("dy"))

    val e1 = oriented.select(col("x"), col("y").as("y1"), col("dy").as("d1"))
    val e2 = oriented.select(col("x"), col("y").as("y2"), col("dy").as("d2"))
    val wedges = e1.join(e2, Seq("x"))
      .filter(col("d1") < col("d2") || (col("d1") === col("d2") && col("y1") < col("y2")))
    // The closing edge y1–y2 is oriented y1→y2: rank(y1) < rank(y2) and
    // rank ordering is exactly the orientation ordering.
    val closing = oriented.select(col("x").as("y1"), col("y").as("y2"))
    val tris = wedges.join(closing, Seq("y1", "y2"))
      .select(col("x"), col("y1"), col("y2"))

    val perNode = tris
      .select(explode(array(col("x"), col("y1"), col("y2"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))

    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(col("deg") >= 2,
            expr("2 * coalesce(n_tri, 0L) * 1000000L div (deg * (deg - 1))"))
          .otherwise(lit(0L)).as("cc_ppm"))
  }
}
