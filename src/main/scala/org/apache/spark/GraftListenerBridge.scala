package org.apache.spark

/** Deterministic listener-bus drain for the spill rehearsal's per-query
  * metric attribution. `LiveListenerBus.waitUntilEmpty` is
  * `private[spark]`; task-end events are enqueued by the DAGScheduler
  * thread BEFORE the job-end event that completes the action, so a
  * drain called after an action returns is a complete, race-free
  * snapshot boundary — unlike the fixed sleeps it replaces, which
  * misattribute late events under co-tenant load (exactly the condition
  * the bench calibration field documents as real). */
object GraftListenerBridge {
  def drain(sc: SparkContext, timeoutMs: Long = 30000): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
