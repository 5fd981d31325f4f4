package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature as one codegen'd double loop: component i is the
  * minimum over the shingle-hash array of the affine rehash
  * (x·aᵢ + bᵢ) mod M with aᵢ = ((2i+1)·2654435761) mod M, bᵢ = 40503·i + 1,
  * M = 10⁹+7 — exactly Dedup.affine, which the q27/q29 DuckDB mirrors
  * replay. The combinator form (transform over sequence of array_min of
  * transform) costs n·|shingles| interpreted lambda calls per row; this is
  * the same integer arithmetic in generated Java. All operands stay below
  * 2^62 (x < M, aᵢ < M ⇒ x·aᵢ < M² ≈ 2^60).
  *
  * Contract quirk preserved: an EMPTY hash array yields a signature of n
  * nulls (array_min of an empty array is null) — callers filter docs with
  * too few tokens before signing, exactly as before.
  */
case class MinHashSig(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig requires array<long>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val m = hs.numElements()
    if (m == 0) return new GenericArrayData(Array.fill[Any](n)(null))
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val a = ((2L * i + 1) * 2654435761L) % 1000000007L
      val b = 40503L * i + 1
      var best = Long.MaxValue
      var k = 0
      while (k < m) {
        val v = (hs.getLong(k) * a + b) % 1000000007L
        if (v < best) best = v
        k += 1
      }
      out(i) = best
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val best = ctx.freshName("best")
      val k = ctx.freshName("k")
      val v = ctx.freshName("v")
      s"""
         |int $m = $hs.numElements();
         |Object[] $out = new Object[$n];
         |if ($m > 0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $a = ((2L * $i + 1) * 2654435761L) % 1000000007L;
         |    long $b = 40503L * $i + 1;
         |    long $best = Long.MAX_VALUE;
         |    for (int $k = 0; $k < $m; $k++) {
         |      long $v = ($hs.getLong($k) * $a + $b) % 1000000007L;
         |      if ($v < $best) $best = $v;
         |    }
         |    $out[$i] = $best;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def minhashSig(hashes: Column, n: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(hashes), n))
}
