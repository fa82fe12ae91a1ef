package org.apache.spark

/** Test-only bridge into `private[spark]` surface: deterministic listener
  * bus draining. ADVICE r11 — RelationStatsSpec's zero-jobs assertion used
  * a fixed Thread.sleep(500) to outwait the async bus, a race under CI
  * load; `LiveListenerBus.waitUntilEmpty()` is the exact primitive Spark's
  * own test suites use, it is just `private[spark]`. */
object GraftTestBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
