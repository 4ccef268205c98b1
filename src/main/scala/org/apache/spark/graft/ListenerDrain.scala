package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `private[spark]` access shim (the ColumnBridge pattern): task-metric
  * listeners (graft.tools.Footprint) must drain the async listener bus
  * before reading their accumulators, or the tail of a query's task-end
  * events is silently attributed to the NEXT query. */
object ListenerDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
