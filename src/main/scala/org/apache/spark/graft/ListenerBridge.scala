package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge into the `private[spark]` listener bus — the supported way to
  * make "all metrics events from the job I just ran have been
  * delivered" a happens-before edge (Spark's own test utilities do
  * exactly this). Without the barrier a metrics audit could read its
  * accumulators before the bus drained and under-count the final
  * stages.
  */
object ListenerBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
