package graft

import org.apache.spark.sql.functions._
import graft.plans.RangeJoinRewrite

/** The optimizer rule must (a) stay inert until the width conf opts in,
  * (b) rewrite an eligible bare range join into the bucketed equi-join
  * with IDENTICAL results, and (c) refuse joins that are already
  * hash-joinable (a cross-side equality conjunct).
  */
class RangeJoinRuleSpec extends SparkSpecBase {

  import spark.implicits._

  private def intervals = Seq((1L, 2L, 7L), (2L, 8L, 13L), (3L, 10L, 20L),
    (4L, 29L, 41L)).toDF("iid", "lo", "hi")
  private def points = (0L to 45L).toDF("pt")

  private def rangeJoin = points.join(intervals,
    col("pt") >= col("lo") && col("pt") <= col("hi"))

  private def withRule[T](width: Option[Long])(f: => T): T = {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = saved :+ RangeJoinRewrite
    width.foreach(w => spark.conf.set(RangeJoinRewrite.WidthConf, w.toString))
    try f finally {
      spark.experimental.extraOptimizations = saved
      spark.conf.unset(RangeJoinRewrite.WidthConf)
    }
  }

  test("inert without the width conf: plan keeps the nested-loop range join") {
    withRule(None) {
      val p = rangeJoin.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct"))
    }
  }

  test("opted in: rewrites to a bucket equi-join with identical results") {
    val expected = rangeJoin.select("pt", "iid").as[(Long, Long)].collect().toSet
    withRule(Some(10L)) {
      val df = rangeJoin
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"rule did not rewrite:\n$p")
      assert(p.contains("Generate") || p.contains("explode"),
        "interval bucket explosion missing from the rewritten plan")
      val got = df.select("pt", "iid").as[(Long, Long)].collect().toSet
      assert(got == expected)
      // output schema untouched by the rewrite's internal bucket columns
      assert(df.columns.toSeq == Seq("pt", "iid", "lo", "hi"))
    }
  }

  test("a cross-side equality conjunct disables the rewrite (already hash-joinable)") {
    withRule(Some(10L)) {
      val df = points.withColumn("k", col("pt") % 2)
        .join(intervals.withColumn("k2", col("iid") % 2),
          col("k") === col("k2") && col("pt") >= col("lo") && col("pt") <= col("hi"))
      val p = df.queryExecution.optimizedPlan.toString
      assert(!p.contains("__graft_pbucket"),
        "equality-keyed join must not be bucketed on top of its hash key")
    }
  }

  test("works from pure SQL through the same session") {
    withRule(Some(10L)) {
      points.createOrReplaceTempView("pts")
      intervals.createOrReplaceTempView("ivs")
      val df = spark.sql(
        "SELECT pt, iid FROM pts JOIN ivs ON pt >= lo AND pt <= hi")
      assert(!df.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      assert(df.count() == rangeJoin.count())
    }
  }
}
