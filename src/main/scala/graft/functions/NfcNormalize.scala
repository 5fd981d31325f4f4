package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonicalization — the text-normalization step that runs
  * before any hash-based dedup on multilingual corpora: composed ("é") and
  * decomposed ("e" + U+0301) spellings of the same text otherwise hash to
  * DIFFERENT fingerprints and defeat exact dedup entirely.
  *
  * Backed by `java.text.Normalizer` (ICU-grade UAX #15 in the JDK); DuckDB
  * mirrors with `nfc_normalize` (utf8proc) — both implement the same
  * Unicode standard, so the q68 oracle is exact. Fast path: NFC quick-check
  * via `Normalizer.isNormalized` avoids allocating for the (dominant)
  * already-normalized case.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalizeU8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.normalizeU8($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Static entry point for the generated code (and eval). */
  def normalizeU8(u: UTF8String): UTF8String = {
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  def nfc(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
