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
  *
  * A band containing any NULL component (MinHashSig emits an all-null
  * signature for an empty hash array) keys as NULL — matching the
  * combinator form, where null folds to a null band key that can never
  * equijoin-match. Without this, null components would read as 0 and every
  * empty-signature doc would share identical keys in every band — the
  * O(n²) bucket blowup the lshCandidates guard warns about.
  */
case class BandKeys(child: Expression, bands: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
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
      var sawNull = false
      while (k < end) {
        if (sig.isNullAt(k)) sawNull = true
        else acc = (acc * 31 + sig.getLong(k)) % 1000000007L
        k += 1
      }
      out(b) = if (sawNull) null else acc
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
      val sawNull = ctx.freshName("sawNull")
      s"""
         |int $r = $sig.numElements() / $bands;
         |Object[] $out = new Object[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $acc = 0L;
         |  boolean $sawNull = false;
         |  int $end = $b * $r + $r;
         |  for (int $k = $b * $r; $k < $end; $k++) {
         |    if ($sig.isNullAt($k)) { $sawNull = true; }
         |    else { $acc = ($acc * 31 + $sig.getLong($k)) % 1000000007L; }
         |  }
         |  $out[$b] = $sawNull ? null : (Object) java.lang.Long.valueOf($acc);
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
