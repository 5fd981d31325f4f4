package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd dense-vector kernels for the similarity suite.
  *
  * The combinator formulation `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * is evaluated by the interpreter one lambda call per ELEMENT — two
  * closure invocations and a boxed double per dimension, and it blocks
  * whole-stage codegen of the enclosing join stage. These expressions are
  * one tight Java loop per row (the PolyHash precedent measured ~100×
  * on per-element work).
  *
  * Semantics are IDENTICAL to the combinator form, including the
  * left-to-right fold order — ((0+t₁)+t₂)+… — which the DuckDB oracle
  * mirrors (`list_reduce(list_prepend(0.0, …))`), so swapping these into
  * q30/q31/q37/q38/q47 changes no result bit. Null vectors yield null. A
  * LENGTH MISMATCH also yields null — the combinator form agreed (zip_with
  * pads the shorter side with nulls, so the sum went null); a
  * truncate-to-min kernel would instead return a finite, plausible-but-
  * wrong distance for mixed-dimension corpora. Null ELEMENTS inside a
  * vector are rejected by the corpus contract (embeddings are dense float
  * arrays cast to double).
  */
abstract class VectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, got ($l, $r)")
    }

  /** Per-element term in Java source: given `$a[$i]` and `$b[$i]` exprs. */
  protected def termJava(x: String, y: String): String
  protected def termEval(x: Double, y: Double): Double

  override def nullSafeEval(a: Any, b: Any): Any = {
    val va = a.asInstanceOf[ArrayData]
    val vb = b.asInstanceOf[ArrayData]
    val n = va.numElements()
    if (n != vb.numElements()) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) {
        s += termEval(va.getDouble(i), vb.getDouble(i))
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ${termJava(s"$a.getDouble($i)", s"$b.getDouble($i)")};
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })
}

/** In-order dot product Σ aᵢ·bᵢ. */
case class DotProduct(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "graft_dot"
  override protected def termJava(x: String, y: String): String = s"$x * $y"
  override protected def termEval(x: Double, y: Double): Double = x * y
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(left = newLeft, right = newRight)
}

/** In-order squared L2 distance Σ (aᵢ-bᵢ)². */
case class L2DistSq(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "graft_l2sq"
  override protected def termJava(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override protected def termEval(x: Double, y: Double): Double = (x - y) * (x - y)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): L2DistSq = copy(left = newLeft, right = newRight)
}

/** Hamming distance between two equal-length int-array bit signatures:
  * Σ popcount(aᵢ xor bᵢ). The banded perceptual-hash verify (q141) runs
  * this once per candidate pair; the combinator form
  * `aggregate(zip_with(a, b, bit_count(_ ^ _)), 0, _+_)` costs two
  * interpreted lambda calls + boxing per band and blocks whole-stage
  * codegen of the verify stage. Identical semantics incl. null on length
  * mismatch (zip_with's null-pad agreement, as in [[VectorFold]]).
  */
case class HammingDistance(left: Expression, right: Expression) extends BinaryExpression {
  import org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_hamming"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<int> arguments, got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val va = a.asInstanceOf[ArrayData]
    val vb = b.asInstanceOf[ArrayData]
    val n = va.numElements()
    if (n != vb.numElements()) null
    else {
      var s = 0
      var i = 0
      while (i < n) {
        s += Integer.bitCount(va.getInt(i) ^ vb.getInt(i))
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $s = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += Integer.bitCount($a.getInt($i) ^ $b.getInt($i));
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HammingDistance = copy(left = newLeft, right = newRight)
}

object VectorOps {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def l2sq(a: Column, b: Column): Column =
    ColumnBridge.column(L2DistSq(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def hamming(a: Column, b: Column): Column =
    ColumnBridge.column(HammingDistance(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
