package org.apache.spark

/** `SparkContext.listenerBus` and `LiveListenerBus.waitUntilEmpty` are
  * `private[spark]`; the bench's per-query task-metric attribution needs a
  * dispatch barrier (listener events post asynchronously, so a snapshot
  * taken right after a job returns can miss its own tail tasks — or charge
  * them to the NEXT query). Same re-export pattern as
  * [[org.apache.spark.sql.GraftColumnBridge]].
  */
object GraftBenchBridge {
  /** Block until every queued listener event has been dispatched; false on
    * timeout (caller logs and carries on — attribution may bleed, never
    * crashes the run).
    */
  def drainListenerBus(sc: SparkContext, timeoutMillis: Long): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMillis); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
