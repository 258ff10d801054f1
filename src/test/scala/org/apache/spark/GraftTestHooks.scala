package org.apache.spark

/** Test-only accessor for `private[spark]` internals: the listener bus
  * must be drained before a spec inspects what a QueryExecutionListener
  * recorded (events are delivered asynchronously).
  */
object GraftTestHooks {
  def flushListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
