package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash h = fold(bytes, 0, (h,b) => (h*31 + b) mod 1e9+7)
  * as a native Catalyst expression with whole-stage codegen.
  *
  * The expression-combinator formulation (transform(sequence(...)) + an
  * aggregate fold, see TextAnalysis.polyHash scaladoc history) is evaluated
  * by the interpreter one lambda call per character with a substring
  * allocation each — ~100× slower and it blocks codegen of the enclosing
  * stage. This version is a tight byte loop in generated Java.
  *
  * Contract: byte-wise over UTF-8; equals the char-wise definition (and the
  * DuckDB oracle mirror) for ASCII input — the corpus contract.
  */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_polyhash requires a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31L + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * 31L + ($bytes[$i] & 0xff)) % 1000000007L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  /** Column API: graft's native polyhash. */
  def polyHash(c: Column): Column =
    ColumnBridge.column(PolyHash(ColumnBridge.expression(c)))
}
