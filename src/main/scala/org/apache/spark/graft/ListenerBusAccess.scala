package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Private[spark] access shim: the async listener bus must be drained
  * before reading stage metrics that should attribute to the query
  * that just ran (same package-placement precedent as the native
  * expressions under org.apache.spark.sql.graft). */
object ListenerBusAccess {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
