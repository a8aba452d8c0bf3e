package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge to the `private[spark]` listener bus: specs that
  * assert the ABSENCE of jobs (WidthSpec's scan-shape-gate pin) must
  * drain the async listener queues deterministically before reading
  * their counters — a fixed sleep lets a late-posted event slip past
  * the assertion (ADVICE r17 #4). `waitUntilEmpty` itself is public on
  * [[org.apache.spark.scheduler.LiveListenerBus]]; only the accessor
  * on SparkContext is package-private, hence this one-liner lives
  * under `org.apache.spark`. */
object ListenerBusDrain {
  /** Block until every queued listener event has been dispatched
    * (bounded at 10 s — a spec hang would be worse than a timeout). */
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty(10000L)
}
