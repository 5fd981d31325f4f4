package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Banded-LSH bucket keys as one codegen'd loop: band b of a signature of
  * length n (r = n/bands rows per band) keys as the order-sensitive fold
  * fold(sig[b·r .. b·r+r), 0, (acc,x) → (acc·31 + x) mod 10⁹+7) — exactly
  * the aggregate-over-slice combinator in Dedup.lshCandidates and the q29
  * DuckDB mirror. acc < M ⇒ acc·31 + x < 2^36: no overflow. Trailing
  * elements of a non-dividing length are ignored, as slice ignored them —
  * callers `require` divisibility up front.
  */
case class BandKeys(child: Expression, bands: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_band_keys"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_band_keys requires array<long>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val sig = input.asInstanceOf[ArrayData]
    val r = sig.numElements() / bands
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var acc = 0L
      var k = b * r
      val end = k + r
      while (k < end) {
        acc = (acc * 31 + sig.getLong(k)) % 1000000007L
        k += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, sig => {
      val r = ctx.freshName("r")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val acc = ctx.freshName("acc")
      val k = ctx.freshName("k")
      val end = ctx.freshName("end")
      s"""
         |int $r = $sig.numElements() / $bands;
         |Object[] $out = new Object[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $acc = 0L;
         |  int $end = $b * $r + $r;
         |  for (int $k = $b * $r; $k < $end; $k++) {
         |    $acc = ($acc * 31 + $sig.getLong($k)) % 1000000007L;
         |  }
         |  $out[$b] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BandKeys =
    copy(child = newChild)
}

object BandKeys {
  def bandKeys(sig: Column, bands: Int): Column =
    ColumnBridge.column(BandKeys(ColumnBridge.expression(sig), bands))
}
