package org.apache.spark.graftutil

import org.apache.spark.SparkContext

/** Deterministic SparkListener-bus drain for the soak gate's per-query
  * metric attribution ([[graft.bench.MaxTaskListener]]): task-end events
  * post asynchronously, so reading a listener's accumulators right after
  * an action can miss stragglers (or, worse, attribute them to the NEXT
  * query after a reset). `listenerBus.waitUntilEmpty` is the engine's own
  * completion barrier but is `private[spark]`, hence this one-method shim
  * in the spark namespace — the replacement for a fixed sleep that was
  * only ever probabilistically long enough. */
object ListenerDrain {
  def drain(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
