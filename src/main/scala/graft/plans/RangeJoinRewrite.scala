package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule (SURVEY §4.3 tier (c), the `Rule[LogicalPlan]` rung):
  * rewrites an INNER join whose only cross-side predicate is a long
  * range test `pt >= lo AND pt <= hi` into the bucketed equi-join of
  * [[graft.ops.RangeJoin]] — automatically, for any query (SQL included)
  * in a session that opts in, instead of requiring callers to know the
  * operator exists. Without the rewrite Spark plans such a join as
  * BroadcastNestedLoopJoin (or a cartesian product): O(|P|·|I|)
  * comparisons and a hard wall once the interval side outgrows the
  * broadcast budget.
  *
  * Opt-in by conf (`spark.graft.rangeJoin.bucketWidth`, in the key's own
  * units, e.g. ns): bucket width is a physical tuning choice (≈ p95
  * interval length) that needs knowledge of the data the optimizer does
  * not have — silently guessing could explode wide intervals into
  * thousands of buckets. Unset → the rule is inert.
  *
  * Eligibility is deliberately narrow (wrong rewrites are worse than
  * slow joins): inner join, a single lower and upper bound over the SAME
  * long-typed point expression, bounds from the opposite side, all three
  * deterministic, and NO cross-side equality conjunct (those joins are
  * already hash-joinable; bucketing would only add overhead). Extra
  * conjuncts are preserved in the post-join filter. Null semantics are
  * unchanged: a null point/bound bucket never equi-matches, exactly as
  * the original range predicate never passes.
  *
  * Injected by [[graft.GraftExtensions]] (`injectOptimizerRule`) and
  * usable via `spark.experimental.extraOptimizations` in an existing
  * session.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.rangeJoin.bucketWidth"

  private def widthOpt: Option[Long] =
    scala.util.Try(conf.getConfString(WidthConf)).toOption
      .flatMap(_.toLongOption).filter(_ > 0)

  override def apply(plan: LogicalPlan): LogicalPlan = widthOpt match {
    case None => plan
    case Some(w) =>
      plan.transformUp {
        // batch only: a stream-stream range join has its own state/
        // watermark machinery, and inserting a Generate between the
        // watermark and the join would break event-time propagation
        case j @ Join(left, right, Inner, Some(cond), hint)
            if !left.isStreaming && !right.isStreaming =>
          rewrite(j, left, right, cond, hint, w).getOrElse(j)
      }
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, hint: JoinHint, w: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def fromSide(e: Expression, side: LogicalPlan): Boolean =
      e.references.nonEmpty && e.references.subsetOf(side.outputSet) &&
        e.deterministic && e.dataType == LongType
    def spansBoth(e: Expression): Boolean =
      e.references.exists(left.outputSet.contains) &&
        e.references.exists(right.outputSet.contains)
    val hasCrossEquality = conjuncts.exists {
      case e @ (EqualTo(_, _) | EqualNullSafe(_, _)) => spansBoth(e)
      case _ => false
    }
    if (hasCrossEquality) return None

    // normalize each conjunct to (pt, bound, isLower) candidates
    def bounds(e: Expression): Seq[(Expression, Expression, Boolean)] = e match {
      case GreaterThanOrEqual(a, b) => Seq((a, b, true), (b, a, false))
      case LessThanOrEqual(a, b) => Seq((a, b, false), (b, a, true))
      case _ => Nil
    }
    // points on `p`, intervals on `i`: find lower+upper over one pt expr
    def find(p: LogicalPlan, i: LogicalPlan):
        Option[(Expression, Expression, Expression, Seq[Expression])] = {
      val cands = conjuncts.flatMap(c => bounds(c).map(b => (c, b)))
        .filter { case (_, (pt, bd, _)) => fromSide(pt, p) && fromSide(bd, i) }
      val pairs = for {
        (c1, (pt1, lo, true)) <- cands
        (c2, (pt2, hi, false)) <- cands
        if c1 != c2 && pt1.semanticEquals(pt2)
      } yield (pt1, lo, hi, conjuncts.filterNot(c => c == c1 || c == c2))
      pairs.headOption
    }

    def build(p: LogicalPlan, i: LogicalPlan, pt: Expression, lo: Expression,
        hi: Expression, rest: Seq[Expression]): LogicalPlan = {
      val width = Literal(w, LongType)
      val pb = Alias(IntegralDivide(pt, width), "__graft_pbucket")()
      val pPlan = Project(p.output :+ pb, p)
      val ibAttr = AttributeReference("__graft_ibucket", LongType)()
      // Sequence is TimeZoneAware: it stays UNRESOLVED until a zone is
      // bound, even for pure long sequences — bind the session zone
      val gen = Explode(Sequence(
        IntegralDivide(lo, width), IntegralDivide(hi, width), None,
        Some(conf.sessionLocalTimeZone)))
      val iPlan = Generate(gen, Nil, outer = false, None, Seq(ibAttr), i)
      val joined = Join(pPlan, iPlan, Inner,
        Some(EqualTo(pb.toAttribute, ibAttr)), hint)
      val range = And(GreaterThanOrEqual(pt, lo), LessThanOrEqual(pt, hi))
      val full = rest.foldLeft[Expression](range)(And(_, _))
      Project(j.output, Filter(full, joined))
    }

    find(left, right).map { case (pt, lo, hi, rest) =>
      build(left, right, pt, lo, hi, rest)
    }.orElse(find(right, left).map { case (pt, lo, hi, rest) =>
      build(right, left, pt, lo, hi, rest)
    })
  }
}
