package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; benchmarking needs its
  * `waitUntilEmpty()` to attribute shuffle bytes to the query that caused
  * them deterministically (a sleep only drains the bus probabilistically
  * under load). This accessor lives in the spark namespace solely to
  * export that one call. */
object ListenerBusHook {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
