package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType
import graft.functions._

/** Library integration via the standard Spark extension point: setting
  *
  * {{{ spark.sql.extensions=graft.GraftExtensions }}}
  *
  * on ANY session (cluster conf, spark-submit, or builder) registers every
  * graft scalar as a permanent SQL function — no driver-side register()
  * calls, works from pure-SQL clients (thriftserver, notebooks, Connect).
  * This is the SURVEY §4.3 tier-(c) surface: the engine's custom Catalyst
  * expressions exposed the same way Spark's own builtins are.
  *
  * Injected: graft_url_normalize(url[, siteBase[, stripAll]]),
  * graft_polyhash(str), graft_simhash48(hash_array),
  * graft_shingle_hashes(text, k), graft_lang_id(tokens).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(clazz: Class[_], name: String): ExpressionInfo =
    new ExpressionInfo(clazz.getName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    // tier-(c) optimizer rule: auto-rewrite bare long-range joins to the
    // bucketed equi-join (inert until spark.graft.rangeJoin.bucketWidth
    // is set — see RangeJoinRewrite's eligibility notes)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    // tier-(c) physical rung: the backward as-of join as a first-class
    // SparkPlan (AsofJoinPhysical.backward also self-registers at call
    // time via experimental.extraStrategies for sessions without this
    // extension class)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinPhysical.AsofJoinStrategy)
    ext.injectFunction((FunctionIdentifier("graft_url_normalize"),
      info(classOf[UrlNormalize], "graft_url_normalize"),
      UrlNormalize.builder))
    ext.injectFunction((FunctionIdentifier("graft_polyhash"),
      info(classOf[PolyHash], "graft_polyhash"),
      { case Seq(e) => PolyHash(e)
        case other => throw new IllegalArgumentException(
          s"graft_polyhash takes 1 argument, got ${other.length}") }))
    ext.injectFunction((FunctionIdentifier("graft_simhash48"),
      info(classOf[SimHash48], "graft_simhash48"),
      { case Seq(e) => SimHash48(e)
        case other => throw new IllegalArgumentException(
          s"graft_simhash48 takes 1 argument, got ${other.length}") }))
    ext.injectFunction((FunctionIdentifier("graft_shingle_hashes"),
      info(classOf[ShingleHashes], "graft_shingle_hashes"),
      { case Seq(e, Literal(k: Int, IntegerType)) => ShingleHashes(e, k)
        case other => throw new IllegalArgumentException(
          "graft_shingle_hashes takes (text, k literal int), got " + other) }))
    ext.injectFunction((FunctionIdentifier("graft_nfc"),
      info(classOf[NfcNormalize], "graft_nfc"),
      { case Seq(e) => NfcNormalize(e)
        case other => throw new IllegalArgumentException(
          s"graft_nfc takes 1 argument, got ${other.length}") }))
    ext.injectFunction((FunctionIdentifier("graft_lang_id"),
      info(classOf[LangIdExpr], "graft_lang_id"),
      { case Seq(e) => LangIdExpr(e)
        case other => throw new IllegalArgumentException(
          s"graft_lang_id takes 1 argument, got ${other.length}") }))
    ext.injectFunction((FunctionIdentifier("graft_hamming"),
      info(classOf[HammingDistance], "graft_hamming"),
      { case Seq(a, b) => HammingDistance(a, b)
        case other => throw new IllegalArgumentException(
          s"graft_hamming takes 2 arguments, got ${other.length}") }))
    ext.injectFunction((FunctionIdentifier("graft_hilbert"),
      info(classOf[HilbertIndex], "graft_hilbert"),
      { case Seq(x, y, Literal(bits: Int, IntegerType)) => HilbertIndex(x, y, bits)
        case other => throw new IllegalArgumentException(
          "graft_hilbert takes (x, y, bits literal int), got " + other) }))
  }
}
