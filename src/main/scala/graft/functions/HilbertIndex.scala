package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of a 2-D cell — the locality-preserving
  * alternative to the Morton/Z-order key for write-side clustering
  * ([[graft.ops.Layout]]): consecutive Hilbert indexes are ALWAYS
  * adjacent cells (no Z-shaped diagonal seams), so a small 2-D range
  * predicate maps to fewer, longer runs of the key space and touches
  * fewer clustered files. One codegen'd loop per row (the
  * [[LshBucket]] kernel family); the standard iterative xy→d transform
  * (rotate-and-accumulate per bit plane, Warren, "Hacker's Delight"
  * §16-1 formulation) on `bits`-bit inputs.
  *
  * Inputs must already be cell codes in [0, 2^bits): Layout normalizes
  * real columns to code space first (min/max or equi-depth rank).
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_hilbert requires (bigint, bigint), got $other")
    }

  override def nullSafeEval(xIn: Any, yIn: Any): Any = {
    var x = xIn.asInstanceOf[Long]
    var y = yIn.asInstanceOf[Long]
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xv, yv) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      s"""
         |long $x = $xv;
         |long $y = $yv;
         |long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) { $x = $s - 1 - $x; $y = $s - 1 - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HilbertIndex = copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  def hilbert(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(HilbertIndex(
      ColumnBridge.expression(x), ColumnBridge.expression(y), bits))
}
