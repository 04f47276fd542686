package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Test-only access to the private[spark] listener bus so metric
  * assertions can drain pending events deterministically (no sleeps).
  */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
