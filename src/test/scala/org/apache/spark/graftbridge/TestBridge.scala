package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Test-only access to `private[spark]` internals: deterministic listener
  * assertions need the shared listener bus drained (the alternative is
  * sleep-and-hope flakiness). */
object TestBridge {
  def waitListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
