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

  /** Touch the driver-side StateStoreCoordinator lazy val (private[sql]
    * on classic.StreamingQueryManager). Spark creates the endpoint when
    * the first STREAMING query starts; a BATCH transformWithState plan
    * loads a transient state store whose executor side looks the
    * endpoint up and dies with RpcEndpointNotFoundException if no
    * stream ever ran in the session. Idempotent.
    */
  def ensureStateStoreCoordinator(session: SparkSession): Unit =
    session.asInstanceOf[ClassicSparkSession].streams.stateStoreCoordinator

  /** Idempotently append a planner strategy to the session. */
  def addStrategy(session: SparkSession, strategy: SparkStrategy): Unit = {
    val exp = session.asInstanceOf[ClassicSparkSession].experimental
    if (!exp.extraStrategies.contains(strategy))
      exp.extraStrategies = exp.extraStrategies :+ strategy
  }
}
