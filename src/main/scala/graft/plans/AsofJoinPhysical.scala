package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** SURVEY §4.3 tier (c), completed to the LAST rung: a custom
  * LogicalPlan + SparkStrategy + physical SparkPlan for the BACKWARD
  * AS-OF JOIN — the operator itself as a first-class physical node, not
  * a composition. [[graft.ops.AsofJoin]] (union-and-fill over built-ins,
  * preference (a)) stays the default; this node exists because the
  * physical form is strictly stronger where it matters at 100 TB:
  *
  *  - **one pass, zero blow-up**: the union form materializes l+r rows
  *    through one window with a carried struct; this exec streams both
  *    sorted sides through a cursor merge — O(1) state (ONE buffered
  *    candidate row per key), no struct carrying, no window machinery;
  *  - **sort/partition reuse**: it declares
  *    `ClusteredDistribution(key, requireAllClusterKeys)` + (key, time)
  *    ordering, so Catalyst's EnsureRequirements plans the exchanges —
  *    bucketed/sorted inputs (q137's layout) plan with NO shuffle at
  *    all, which the union form can never express;
  *  - left-outer semantics: probes with no prior reference emit nulls.
  *
  * Equivalence with the composed form is pinned row-for-row in
  * AsofPhysicalSpec; determinism under equal reference timestamps comes
  * from the explicit tie-break column in the right-side ordering.
  * MVP surface: single LONG key + LONG time per side (the engine's
  * canonical (entity id, event-time ns/µs) shape).
  */
object AsofJoinPhysical {

  /** Logical marker node — resolved at construction (attributes come from
    * analyzed children), planned by [[AsofJoinStrategy]].
    */
  final case class AsofJoinNode(left: LogicalPlan, right: LogicalPlan,
      leftKey: Expression, rightKey: Expression,
      leftTime: Expression, rightTime: Expression,
      rightTie: Expression) extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
      copy(left = newLeft, right = newRight)
  }

  object AsofJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsofJoinNode(l, r, lk, rk, lt, rt, tie) =>
        AsofJoinExec(lk, rk, lt, rt, tie, planLater(l), planLater(r)) :: Nil
      case _ => Nil
    }
  }

  /** For each left row, attach the latest right row with
    * rightTime <= leftTime on the same key (ties broken by the largest
    * `rightTie`); unmatched left rows keep null right columns.
    *
    * Column names must be disjoint across the two inputs; key and time
    * columns must be LONG. The right side is re-projected (fresh
    * expression ids), so self-joins — the common shape, both sides cut
    * from one events table — are safe.
    */
  def backward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String, rightTie: String): DataFrame = {
    val spark = left.sparkSession
    GraftBridge.addStrategy(spark, AsofJoinStrategy)
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "left/right column names must be disjoint")
    // fresh exprIds on the right: both sides of an as-of join routinely
    // derive from the SAME scan, and duplicate ids corrupt resolution
    val r2 = right.toDF(right.columns: _*)
    val lp = left.queryExecution.analyzed
    val rp = r2.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found"))
    val (lk, lt) = (attr(lp, leftKey), attr(lp, leftTime))
    val (rk, rt, tie) = (attr(rp, rightKey), attr(rp, rightTime), attr(rp, rightTie))
    Seq(lk, lt, rk, rt).foreach(a => require(a.dataType == LongType,
      s"as-of key/time columns must be LONG, ${a.name} is ${a.dataType}"))
    GraftBridge.ofRows(spark, AsofJoinNode(lp, rp, lk, rk, lt, rt, tie))
  }
}

/** Physical backward as-of join: both children arrive hash-clustered on
  * the key and sorted by (key, time[, tie]) — declared requirements, so
  * EnsureRequirements inserts (or ELIDES, for pre-bucketed inputs) the
  * exchanges — and each partition pair streams through a two-cursor
  * merge holding exactly one buffered candidate row. Null key/time rows:
  * right side never matches (skipped at the cursor), left side emits
  * null-extended (ASOF comparison with NULL never passes).
  */
final case class AsofJoinExec(leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression, rightTie: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey), requireAllClusterKeys = true) ::
      ClusteredDistribution(Seq(rightKey), requireAllClusterKeys = true) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val (lk, lt) = (leftKey, leftTime)
    val (rk, rt) = (rightKey, rightTime)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lProj = UnsafeProjection.create(Seq(lk, lt), lOut)
      val rProj = UnsafeProjection.create(Seq(rk, rt), rOut)
      // bind against NULLABLE right attributes: unmatched probes feed a
      // null-filled GenericInternalRow, and a non-nullable binding would
      // skip the null check and read zeros instead
      val outProj = UnsafeProjection.create(
        outAttrs.map(a => a: Expression),
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      // right cursor (kept UNcopied — consumed before the next advance)
      var rHead: InternalRow = null
      var rKeyV = 0L
      var rTimeV = 0L
      var rValid = false
      def advanceRight(): Unit = {
        rValid = false
        while (!rValid && rIter.hasNext) {
          val r = rIter.next()
          val k = rProj(r)
          if (!k.isNullAt(0) && !k.isNullAt(1)) {
            rHead = r; rKeyV = k.getLong(0); rTimeV = k.getLong(1); rValid = true
          }
        }
        if (!rValid) rHead = null
      }
      advanceRight()
      // one buffered candidate per key — the operator's ENTIRE state
      var cand: InternalRow = null
      var candKey = 0L
      lIter.map { l =>
        val k = lProj(l)
        if (k.isNullAt(0) || k.isNullAt(1)) {
          outProj(joined(l, nullRight))
        } else {
          val lKeyV = k.getLong(0)
          val lTimeV = k.getLong(1)
          if (cand != null && candKey != lKeyV) cand = null
          while (rValid && (rKeyV < lKeyV ||
            (rKeyV == lKeyV && rTimeV <= lTimeV))) {
            if (rKeyV == lKeyV) { cand = rHead.copy(); candKey = rKeyV }
            advanceRight()
          }
          outProj(joined(l, if (cand != null) cand else nullRight))
        }
      }
    }
  }
}
