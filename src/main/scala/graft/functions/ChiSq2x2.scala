package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Exact 2×2 Pearson chi-square over the four cell counts (a, b, c, d),
  * in unbounded integer arithmetic, as LAZY Catalyst expressions:
  *
  *   chi2_micro  = N·(ad−bc)²·10⁶ div (R₁·R₂·C₁·C₂)   (NULL on a zero margin)
  *   significant = N·(ad−bc)²·10⁶ > 3841459·R₁·R₂·C₁·C₂   (χ²₍₀.₀₅,1₎)
  *
  * History: through round 10 this tail was chained DECIMAL(20,0) products
  * (NULL past 1e38); round 11 moved it to a DRIVER BigInt fold — exact at
  * any magnitude, but the fold ran `collect()` inside the query BUILDER,
  * so merely constructing q181/q280 executed a full scan and the returned
  * plan was a 1-row LocalRelation invisible to PlanGate/FleetPlanShapeSpec
  * (round-11 advice, medium). These expressions keep the exact
  * BigInteger arithmetic but evaluate it inside the plan, on the 1-row
  * aggregate, at execution time — the scan stays lazy and the audited plan
  * is the real one. Cost is irrelevant by construction (one row); the
  * generated code just calls the static helpers below.
  *
  * Truncating `divide` toward zero on non-negative quantities ≡ DuckDB
  * HUGEINT `//` — the oracle mirrors stay bit-exact.
  */
object ChiSq2x2 {

  /** N·(ad−bc)²·10⁶ — the scaled numerator, exact at any magnitude. */
  def num(a: Long, b: Long, c: Long, d: Long): BigInteger = {
    val (ba, bb, bc, bd) = (BigInteger.valueOf(a), BigInteger.valueOf(b),
      BigInteger.valueOf(c), BigInteger.valueOf(d))
    val n = ba.add(bb).add(bc).add(bd)
    val det = ba.multiply(bd).subtract(bb.multiply(bc))
    n.multiply(det).multiply(det).multiply(BigInteger.valueOf(1000000L))
  }

  /** R₁·R₂·C₁·C₂ — the margin product. */
  def den(a: Long, b: Long, c: Long, d: Long): BigInteger = {
    val (ba, bb, bc, bd) = (BigInteger.valueOf(a), BigInteger.valueOf(b),
      BigInteger.valueOf(c), BigInteger.valueOf(d))
    ba.add(bb).multiply(bc.add(bd)).multiply(ba.add(bc)).multiply(bb.add(bd))
  }

  private val Crit = BigInteger.valueOf(3841459L) // χ²(0.05, 1) × 10⁶

  /** True iff the 5% verdict fires (num > den·crit). */
  def signif(a: Long, b: Long, c: Long, d: Long): Boolean =
    num(a, b, c, d).compareTo(den(a, b, c, d).multiply(Crit)) > 0

  def chi2Micro(a: Column, b: Column, c: Column, d: Column): Column =
    ColumnBridge.column(ChiSq2x2Micro(ColumnBridge.expression(a),
      ColumnBridge.expression(b), ColumnBridge.expression(c),
      ColumnBridge.expression(d)))

  def significant(a: Column, b: Column, c: Column, d: Column): Column =
    ColumnBridge.column(ChiSq2x2Signif(ColumnBridge.expression(a),
      ColumnBridge.expression(b), ColumnBridge.expression(c),
      ColumnBridge.expression(d)))
}

sealed trait ChiSq2x2Base extends QuaternaryExpression {
  def first: Expression
  def second: Expression
  def third: Expression
  def fourth: Expression
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires four bigint cells, got " +
        children.map(_.dataType).mkString(", "))
}

/** chi2_micro: nullable — a degenerate zero margin (a constant factor)
  * yields NULL, matching the SQL mirror's `num // den` on HUGEINT.
  */
case class ChiSq2x2Micro(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends ChiSq2x2Base {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_chisq2x2_micro"

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any = {
    val den = ChiSq2x2.den(a.asInstanceOf[Long], b.asInstanceOf[Long],
      c.asInstanceOf[Long], d.asInstanceOf[Long])
    if (den.signum() == 0) null
    else ChiSq2x2.num(a.asInstanceOf[Long], b.asInstanceOf[Long],
      c.asInstanceOf[Long], d.asInstanceOf[Long]).divide(den).longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) => {
      val den = ctx.freshName("den")
      s"""
         |java.math.BigInteger $den = graft.functions.ChiSq2x2.den($a, $b, $c, $d);
         |if ($den.signum() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.ChiSq2x2.num($a, $b, $c, $d)
         |    .divide($den).longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): ChiSq2x2Micro =
    copy(first = a, second = b, third = c, fourth = d)
}

case class ChiSq2x2Signif(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends ChiSq2x2Base {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_chisq2x2_signif"

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    ChiSq2x2.signif(a.asInstanceOf[Long], b.asInstanceOf[Long],
      c.asInstanceOf[Long], d.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = graft.functions.ChiSq2x2.signif($a, $b, $c, $d);")

  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): ChiSq2x2Signif =
    copy(first = a, second = b, third = c, fourth = d)
}
