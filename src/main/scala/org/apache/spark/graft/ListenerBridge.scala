package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge to the `private[spark]` listener bus drain — used only by the
  * optimization-round instrument [[graft.Profile]] so per-query stage
  * metrics are fully delivered before the listener is read (the bus is
  * async; reading without a drain undercounts the last stages). No
  * correctness path uses this. */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
