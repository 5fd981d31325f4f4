package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Random-hyperplane LSH bucket id as one codegen'd loop (the fourth member
  * of the codegen kernel family — see [[VectorFold]] for the rationale).
  *
  * Semantics are bit-identical to the Similarity.lshBucketT combinator
  * form the DuckDB q31 oracle mirrors: bit j of the bucket is the sign of
  * the in-order fold Σᵢ vᵢ·h(j+1000·table, i), with the hyperplane
  * component h an exact integer LCG scaled by 1/1000 — every operation
  * below replays the same integer and IEEE double sequence:
  * seed = j'·4099 + i·131 + 7; lcg = (seed·1103515245 + 12345) mod 2^31-1;
  * h = (lcg mod 2001 − 1000)/1000. All intermediates stay positive and
  * < 2^53, so `%` equals pmod and the double division is exact-input.
  */
case class LshBucket(child: Expression, nBits: Int, table: Int)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lsh_bucket"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_bucket requires array<double>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var bucket = 0L
    var j = 0
    while (j < nBits) {
      val jj = (j + table * 1000L) * 4099L
      var proj = 0.0
      var i = 0
      while (i < n) {
        val lcg = ((jj + i * 131L + 7L) * 1103515245L + 12345L) % 2147483647L
        proj += v.getDouble(i) * ((lcg % 2001L - 1000L).toDouble / 1000.0)
        i += 1
      }
      bucket = bucket * 2 + (if (proj > 0) 1L else 0L)
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val bucket = ctx.freshName("bucket")
      val j = ctx.freshName("j")
      val jj = ctx.freshName("jj")
      val proj = ctx.freshName("proj")
      val i = ctx.freshName("i")
      val lcg = ctx.freshName("lcg")
      s"""
         |int $n = $v.numElements();
         |long $bucket = 0L;
         |for (int $j = 0; $j < $nBits; $j++) {
         |  long $jj = ($j + ${table}L * 1000L) * 4099L;
         |  double $proj = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $lcg = (($jj + $i * 131L + 7L) * 1103515245L + 12345L) % 2147483647L;
         |    $proj += $v.getDouble($i) * (($lcg % 2001L - 1000L) / 1000.0);
         |  }
         |  $bucket = $bucket * 2 + ($proj > 0 ? 1L : 0L);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

object LshBucket {
  def lshBucket(vec: Column, nBits: Int, table: Int): Column =
    ColumnBridge.column(LshBucket(ColumnBridge.expression(vec), nBits, table))
}
