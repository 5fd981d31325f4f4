package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Real BPE token count as a codegen'd scalar: pre-tokenize with the q96
  * GPT-2 regex, greedily apply [[graft.ext.Bpe]]'s learned merge table,
  * return the total token count. The trained encoder rides the plan as a
  * reference object (`ctx.addReferenceObj` — the same plan-literal
  * discipline as the IVF/PQ models), so the generated Java stays inside
  * whole-stage codegen and every executor gets the table with the plan,
  * no side-channel distribution.
  */
case class BpeTokenCountExpr(child: Expression, encoder: graft.ext.Bpe.Encoder)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_token_count"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_token_count requires a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    encoder.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncoder", encoder,
      classOf[graft.ext.Bpe.Encoder].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.countTokens($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCountExpr =
    copy(child = newChild)
}

object BpeTokenCountExpr {
  def bpeTokenCount(c: Column, encoder: graft.ext.Bpe.Encoder): Column =
    ColumnBridge.column(BpeTokenCountExpr(ColumnBridge.expression(c), encoder))
}
