package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, ExprId}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Column-level lineage from the ANALYZED logical plan: for every output
  * column, the set of (source table, source column) leaves it
  * transitively depends on — the governance primitive behind impact
  * analysis ("which outputs break if lineitem.l_discount changes?") and
  * subject-access scoping (q335 exports WHICH columns touched PII;
  * this answers it from the plan instead of by hand).
  *
  * Mechanics: one bottom-up pass propagating `ExprId → {(table, col)}`.
  * Leaves seed from their relation identity (file-source relations use
  * the root path's basename, V2 relations their table name); every
  * `Alias` created anywhere above (projects, aggregates, windows)
  * unions the provenance of the attributes it references; `Generate`
  * maps its generator output to the generator's inputs; `Union` merges
  * the children positionally (its output reuses only the first child's
  * ExprIds); CTE definitions resolve through `WithCTE`/`CTERelationRef`
  * positionally. Scalar/IN subqueries contribute their outer
  * references; data flowing only INTO a predicate (a filter column
  * dropped before the output) intentionally does not appear — this is
  * value lineage, not control lineage.
  */
object Lineage {

  type Src = (String, String)

  /** Lineage for every output column of `df` (by column name, in output
    * order). Columns derived only from literals map to the empty set.
    */
  def columnLineage(df: DataFrame): Seq[(String, Set[Src])] = {
    val plan = df.queryExecution.analyzed
    val prov = provenance(plan, Map.empty)
    plan.output.map(a => a.name -> prov.getOrElse(a.exprId, Set.empty))
  }

  private def tableName(leaf: LogicalPlan): String = leaf match {
    case lr: LogicalRelation =>
      lr.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          val p = fs.location.rootPaths.headOption.map(_.getName).getOrElse("file")
          p.replaceAll("\\.parquet$|\\.csv$|\\.json$", "")
        case other => other.getClass.getSimpleName
      }
    case r: DataSourceV2Relation => r.table.name()
    case _: LocalRelation => "local"
    case other => other.nodeName.toLowerCase
  }

  /** Bottom-up provenance; `cte` carries definitions visible at this
    * depth (id → per-position provenance of the definition's output).
    */
  private def provenance(p: LogicalPlan,
      cte: Map[Long, Seq[Set[Src]]]): Map[ExprId, Set[Src]] = p match {
    case w: WithCTE =>
      // defs may reference earlier defs; fold left building visibility
      val (cteDefs, _) = w.cteDefs.foldLeft((cte, Map.empty[ExprId, Set[Src]])) {
        case ((visible, _), d) =>
          val m = provenance(d.child, visible)
          (visible + (d.id -> d.child.output.map(a => m.getOrElse(a.exprId, Set.empty[Src]))), m)
      }
      provenance(w.plan, cteDefs)
    case ref: CTERelationRef =>
      cte.get(ref.cteId) match {
        case Some(cols) => ref.output.zip(cols).map { case (a, s) => a.exprId -> s }.toMap
        case None => ref.output.map(a => a.exprId -> Set.empty[Src]).toMap
      }
    case ref: UnionLoopRef =>
      // the recursive self-reference inside a UnionLoop — not a data
      // source; its rows are (transitively) the anchor's, which the
      // UnionLoop case below attributes
      ref.output.map(a => a.exprId -> Set.empty[Src]).toMap
    case ul: UnionLoop =>
      // recursive-CTE body: fresh output ExprIds; rows originate from
      // the anchor (first child) with the recursion transforming them
      val childMaps = ul.children.map(provenance(_, cte))
      val merged = ul.output.indices.map { i =>
        ul.output(i).exprId ->
          ul.children.zip(childMaps).flatMap { case (c, m) =>
            m.getOrElse(c.output(i).exprId, Set.empty[Src])
          }.toSet
      }.toMap
      childMaps.fold(Map.empty[ExprId, Set[Src]])(_ ++ _) ++ merged
    case leaf: LeafNode =>
      val t = tableName(leaf)
      leaf.output.map(a => a.exprId -> Set[Src](t -> a.name)).toMap
    case u: Union =>
      val childMaps = u.children.map(provenance(_, cte))
      val merged = u.output.indices.map { i =>
        u.output(i).exprId ->
          u.children.zip(childMaps).flatMap { case (c, m) =>
            m.getOrElse(c.output(i).exprId, Set.empty[Src])
          }.toSet
      }.toMap
      childMaps.fold(Map.empty[ExprId, Set[Src]])(_ ++ _) ++ merged
    case _ =>
      val below = p.children.map(provenance(_, cte))
        .fold(Map.empty[ExprId, Set[Src]])(_ ++ _)
      def ofAttrs(refs: Iterable[Attribute]): Set[Src] =
        refs.flatMap(a => below.getOrElse(a.exprId, Set.empty[Src])).toSet
      val subqueryProv: Map[ExprId, Set[Src]] =
        p.expressions.flatMap(_.collect {
          case sq: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
            provenance(sq.plan, cte)
        }).fold(Map.empty[ExprId, Set[Src]])(_ ++ _)
      val all = below ++ subqueryProv
      def ofAttrsAll(refs: Iterable[Attribute]): Set[Src] =
        refs.flatMap(a => all.getOrElse(a.exprId, Set.empty[Src])).toSet
      val fresh: Map[ExprId, Set[Src]] = p match {
        case g: Generate =>
          val src = ofAttrs(g.generator.references.toSeq)
          g.generatorOutput.map(a => a.exprId -> src).toMap
        case _ =>
          // every Alias born in this node (project lists, aggregate and
          // window expression trees, ...) — nested aliases included
          p.expressions.flatMap(_.collect {
            case al: Alias => al.exprId -> ofAttrsAll(al.references.toSeq)
          }).toMap
      }
      all ++ fresh
  }

  /** Render as stable text (for the CLI and golden assertions). */
  def render(df: DataFrame): String =
    columnLineage(df).map { case (out, srcs) =>
      val s = srcs.toSeq.sorted.map { case (t, c) => s"$t.$c" }.mkString(", ")
      f"$out%-24s <- ${if (s.isEmpty) "(no column inputs: literals/row counts)" else s}"
    }.mkString("\n")
}
