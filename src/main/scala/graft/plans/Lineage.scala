package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, ExprId, SubqueryExpression}
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
  * unions the provenance of the attributes it references PLUS the
  * output provenance of any scalar/IN subquery in its tree (the
  * subquery's own columns feed the value even though only outer refs
  * appear in `references`); `Generate` maps its generator output to the
  * generator's inputs; `Expand` (rollup/cube/GROUPING SETS mint fresh
  * output ExprIds) and `Union` merge their children positionally;
  * `Intersect` merges positionally too (its output VALUES are
  * constrained by both sides), while `Except` stays left-only by
  * convention — its output rows ARE left rows, the right side only
  * removes some (a control dependency, reported by control mode below);
  * CTE definitions resolve through `WithCTE`/`CTERelationRef`
  * positionally.
  *
  * Two modes:
  *  - VALUE lineage (default): data flowing only INTO a predicate (a
  *    filter column dropped before the output) does not appear. Right
  *    for impact analysis.
  *  - CONTROL lineage (`controlSources` / `columnLineage(df, true)`):
  *    additionally unions, into every output column, the sources read
  *    by row-selecting expressions anywhere in the plan — Filter and
  *    Join conditions, Sort orders (they select under Limit),
  *    Aggregate grouping keys, Deduplicate keys, Except's right side,
  *    and the outputs of predicate subqueries. Right for PII scoping:
  *    a filter on `c_phone` still TOUCHES c_phone even though no
  *    output value derives from it. Every root output shares one row
  *    set, so the control set is global to the frame by construction.
  */
object Lineage {

  type Src = (String, String)

  /** Lineage for every output column of `df` (by column name, in output
    * order). Columns derived only from literals map to the empty set.
    * With `includeControl=true` every column additionally carries the
    * plan's control sources (see class doc).
    */
  def columnLineage(df: DataFrame): Seq[(String, Set[Src])] =
    columnLineage(df, includeControl = false)

  def columnLineage(df: DataFrame, includeControl: Boolean): Seq[(String, Set[Src])] = {
    val plan = df.queryExecution.analyzed
    val w = new Walk(trackControl = includeControl)
    val prov = w.provenance(plan, Map.empty)
    val ctl = if (includeControl) w.controlSrcs.toSet else Set.empty[Src]
    plan.output.map(a => a.name -> (prov.getOrElse(a.exprId, Set.empty) ++ ctl))
  }

  /** Just the control sources: every (table, column) read by a
    * row-selecting expression anywhere in the plan. */
  def controlSources(df: DataFrame): Set[Src] = {
    val w = new Walk(trackControl = true)
    w.provenance(df.queryExecution.analyzed, Map.empty)
    w.controlSrcs.toSet
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

  private final class Walk(trackControl: Boolean) {

    val controlSrcs = scala.collection.mutable.Set.empty[Src]

    /** Bottom-up provenance; `cte` carries definitions visible at this
      * depth (id → per-position provenance of the definition's output).
      */
    def provenance(p: LogicalPlan,
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
      case ix: Intersect =>
        // output reuses the LEFT child's ExprIds, but every output value
        // had to occur on BOTH sides — merge positionally like Union
        val childMaps = ix.children.map(provenance(_, cte))
        val merged = ix.output.indices.map { i =>
          ix.output(i).exprId ->
            ix.children.zip(childMaps).flatMap { case (c, m) =>
              m.getOrElse(c.output(i).exprId, Set.empty[Src])
            }.toSet
        }.toMap
        childMaps.fold(Map.empty[ExprId, Set[Src]])(_ ++ _) ++ merged
      case ex: Except =>
        // output rows ARE left rows (Except only removes some), so value
        // lineage is left-only; the right side is a membership test —
        // record it as control
        val left = provenance(ex.left, cte)
        val right = provenance(ex.right, cte)
        if (trackControl)
          ex.right.output.foreach(a =>
            controlSrcs ++= right.getOrElse(a.exprId, Set.empty[Src]))
        left ++ right
      case e: Expand =>
        // rollup/cube/GROUPING SETS: Expand mints fresh output ExprIds
        // with no Alias — map each output position to the union of the
        // provenance of what that position references across ALL
        // projection rows (mirrors the Union positional merge)
        val below = provenance(e.child, cte)
        def of(refs: Iterable[Attribute]): Set[Src] =
          refs.flatMap(a => below.getOrElse(a.exprId, Set.empty[Src])).toSet
        val fresh = e.output.indices.map { i =>
          e.output(i).exprId ->
            e.projections.flatMap(row => of(row(i).references.toSeq)).toSet
        }.toMap
        below ++ fresh
      case _ =>
        val below = p.children.map(provenance(_, cte))
          .fold(Map.empty[ExprId, Set[Src]])(_ ++ _)
        val subqueryProv: Map[ExprId, Set[Src]] =
          p.expressions.flatMap(_.collect {
            case sq: SubqueryExpression => provenance(sq.plan, cte)
          }).fold(Map.empty[ExprId, Set[Src]])(_ ++ _)
        val all = below ++ subqueryProv
        def ofAttrsAll(refs: Iterable[Attribute]): Set[Src] =
          refs.flatMap(a => all.getOrElse(a.exprId, Set.empty[Src])).toSet
        // sources a whole expression tree reads: its attribute refs plus
        // the OUTPUT columns of any subquery nested in it (a scalar
        // subquery's `references` exposes only outer attrs, so the inner
        // plan's own columns never surface through refs alone)
        def ofExpr(ex: org.apache.spark.sql.catalyst.expressions.Expression): Set[Src] =
          ofAttrsAll(ex.references.toSeq) ++
            ex.collect { case sq: SubqueryExpression =>
              sq.plan.output.flatMap(a => all.getOrElse(a.exprId, Set.empty[Src]))
            }.flatten.toSet
        if (trackControl) p match {
          case f: Filter => controlSrcs ++= ofExpr(f.condition)
          case j: Join => j.condition.foreach(c => controlSrcs ++= ofExpr(c))
          case s: Sort => s.order.foreach(o => controlSrcs ++= ofExpr(o))
          case a: Aggregate =>
            a.groupingExpressions.foreach(g => controlSrcs ++= ofExpr(g))
          case d: Deduplicate => d.keys.foreach(k => controlSrcs ++= ofExpr(k))
          case _ => ()
        }
        val fresh: Map[ExprId, Set[Src]] = p match {
          case g: Generate =>
            val src = ofExpr(g.generator)
            g.generatorOutput.map(a => a.exprId -> src).toMap
          case _ =>
            // every Alias born in this node (project lists, aggregate and
            // window expression trees, ...) — nested aliases included
            p.expressions.flatMap(_.collect {
              case al: Alias => al.exprId -> ofExpr(al.child)
            }).toMap
        }
        all ++ fresh
    }
  }

  /** Render as stable text (for the CLI and golden assertions). */
  def render(df: DataFrame): String =
    columnLineage(df).map { case (out, srcs) =>
      val s = srcs.toSeq.sorted.map { case (t, c) => s"$t.$c" }.mkString(", ")
      f"$out%-24s <- ${if (s.isEmpty) "(no column inputs: literals/row counts)" else s}"
    }.mkString("\n")
}
