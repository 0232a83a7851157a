package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge to `private[spark]` scheduler internals: the skew
  * property suite measures per-task shuffle-read record counts through a
  * SparkListener, and must drain the async listener bus before reading
  * its accumulator — `SparkContext.listenerBus` is `private[spark]`, so
  * the drain call lives in an org.apache.spark subpackage (the same seam
  * as sql/graft/Bridge.scala uses for Column ⇄ Expression).
  */
object TestBridge {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(30000L)
}
