package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Listener-bus access for exact per-query metric attribution.
  * `SparkContext.listenerBus` and `waitUntilEmpty()` are
  * `private[spark]`, so the bench's work accounting (shuffle bytes /
  * task counts sliced per query) reaches them through this shim — the
  * same extension-point pattern as
  * [[org.apache.spark.sql.graftbridge.ColumnBridge]]. Without the
  * drain, listener events from a just-finished action may still be in
  * flight when the next query starts and its work would be misattributed
  * to the wrong query. */
object ListenerBridge {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
