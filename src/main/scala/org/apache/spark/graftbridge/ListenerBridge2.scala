package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Main-source twin of the test ListenerBridge: drain the
  * private[spark] listener bus so plan-capture tooling
  * (tools/EagerPlanAudit, PlanPinSpec) sees every executed plan
  * deterministically (no sleeps).
  */
object ListenerBridge2 {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
