package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Heuristic language ID (marker-token argmax) as ONE codegen'd pass over
  * the document bytes.
  *
  * The combinator formulation (round 1) ran 25 interpreted
  * `filter`/`array_contains` scans per row — one per (language, marker) —
  * re-tokenizing the text for each language (~10s of the sf0.1 bench on
  * q23). This expression tokenizes once and scores all five languages in a
  * single byte pass; semantics are identical: duplicate marker tokens count,
  * ties go to the first-listed language, all-zero → "und". Mirrors the
  * reference's marker heuristic shape; the oracle mirror is the q23Sql CASE.
  */
case class LangIdExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_lang_id"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_lang_id requires a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    LangIdExpr.predict(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LangIdExpr.predict($c);")

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

object LangIdExpr {
  import graft.ext.TextAnalysis.LangMarkers

  private val langs: Array[UTF8String] =
    LangMarkers.map(l => UTF8String.fromString(l._1)).toArray
  private val und = UTF8String.fromString("und")
  private val markerBytes: Array[Array[Array[Byte]]] =
    LangMarkers.map(_._2.map(_.getBytes("UTF-8")).toArray).toArray

  /** Single pass: walk space-separated tokens once, bump each language whose
    * marker list contains the token (byte-equality; markers are ASCII).
    * Called from both eval and the generated Java (static forwarder).
    */
  def predict(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val n = bytes.length
    val counts = new Array[Int](langs.length)
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        val len = i - start
        if (len > 0) {
          var l = 0
          while (l < markerBytes.length) {
            val ms = markerBytes(l)
            var m = 0
            var matched = false
            while (m < ms.length && !matched) {
              val mk = ms(m)
              if (mk.length == len) {
                var j = 0
                while (j < len && mk(j) == bytes(start + j)) j += 1
                matched = j == len
              }
              m += 1
            }
            if (matched) counts(l) += 1
            l += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var best = 0
    var l = 1
    while (l < counts.length) {
      if (counts(l) > counts(best)) best = l // strict > → first max wins ties
      l += 1
    }
    if (counts(best) == 0) und else langs(best)
  }

  /** Column API: single-pass language ID. */
  def langId(c: Column): Column =
    ColumnBridge.column(LangIdExpr(ColumnBridge.expression(c)))
}
