package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.execution.SparkStrategy

/** Minimal private[sql] bridge for graft's custom-plan tier: building a
  * DataFrame from a hand-constructed LogicalPlan, and runtime strategy
  * registration. Lives in the `org.apache.spark.sql` package solely to
  * satisfy the `private[sql]` access on `classic.Dataset.ofRows` — the
  * standard extension-library technique (same access pattern Spark's own
  * test utilities and third-party connectors use). No Spark internals are
  * modified.
  */
object GraftBridge {

  /** DataFrame over a custom (already resolved) logical plan. */
  def ofRows(session: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(session.asInstanceOf[ClassicSparkSession], plan)

  /** Idempotently append a planner strategy to the session. */
  def addStrategy(session: SparkSession, strategy: SparkStrategy): Unit = {
    val exp = session.asInstanceOf[ClassicSparkSession].experimental
    if (!exp.extraStrategies.contains(strategy))
      exp.extraStrategies = exp.extraStrategies :+ strategy
  }
}
