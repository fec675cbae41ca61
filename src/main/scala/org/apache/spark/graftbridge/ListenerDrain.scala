package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; the bench harness needs
  * to drain it between timed runs so each query's job/stage events are
  * attributed to the query that produced them (the bus is asynchronous —
  * without a drain, a fast query inherits its predecessor's tail events).
  * This bridge lives in the org.apache.spark namespace solely to expose
  * that one call; nothing else may go through it.
  */
object ListenerDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
