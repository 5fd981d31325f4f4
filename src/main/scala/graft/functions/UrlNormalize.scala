package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.core.UrlOps

/** url_normalize as a native Catalyst expression (the SURVEY §4.3 "perf
  * tier" for F1): same semantics as the Scala-UDF form (UrlOps.normalize,
  * unit-pinned in UrlOpsSpec) but evaluated directly on UTF8String — no
  * ScalaUDF closure wrapper, no catalyst↔Scala converters, null handling in
  * the expression frame. `doGenCode` emits a direct static call into
  * UrlOps.normalizeU8 (the PolyHash/SimHash48 pattern), so a projection
  * using it stays inside whole-stage codegen — the round-2 CodegenFallback
  * form dropped the stage to interpreted eval and made q12 the third-
  * slowest bench query. SQL-callable via
  * `graft_url_normalize(url[, siteBase[, stripAll]])`.
  */
case class UrlNormalize(child: Expression, siteBase: String, stripAllParams: Boolean)
  extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_url_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_url_normalize requires a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    UrlOps.normalizeU8(input.asInstanceOf[UTF8String], siteBase, stripAllParams)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // siteBase rides as a referenced object (not an escaped source literal);
    // stripAllParams is a plan-time constant and inlines as a boolean literal
    val base = ctx.addReferenceObj("siteBase", siteBase, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.core.UrlOps.normalizeU8($c, $base, $stripAllParams);")
  }

  override protected def withNewChildInternal(newChild: Expression): UrlNormalize =
    copy(child = newChild)
}

object UrlNormalize {

  def urlNormalize(c: Column, siteBase: String = "", stripAllParams: Boolean = false): Column =
    ColumnBridge.column(UrlNormalize(ColumnBridge.expression(c), siteBase, stripAllParams))

  /** SQL-arguments builder — shared by the per-session [[register]] and the
    * config-level [[graft.GraftExtensions]] injection.
    */
  val builder: Seq[Expression] => Expression = { exprs =>
      def str(e: Expression, what: String): String = e match {
        case Literal(v: UTF8String, StringType) => v.toString
        case Literal(null, _) => ""
        case other => throw new IllegalArgumentException(
          s"graft_url_normalize: $what must be a string literal, got $other")
      }
      def bool(e: Expression): Boolean = e match {
        case Literal(v: Boolean, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_url_normalize: stripAllParams must be a boolean literal, got $other")
      }
      exprs match {
        case Seq(u) => UrlNormalize(u, "", stripAllParams = false)
        case Seq(u, base) => UrlNormalize(u, str(base, "siteBase"), stripAllParams = false)
        case Seq(u, base, strip) => UrlNormalize(u, str(base, "siteBase"), bool(strip))
        case _ => throw new IllegalArgumentException(
          "graft_url_normalize takes 1 to 3 arguments")
      }
  }

  /** Make `graft_url_normalize` callable from spark.sql on one session. */
  def register(spark: SparkSession): Unit =
    ColumnBridge.registerFunction(spark, "graft_url_normalize", builder)
}
