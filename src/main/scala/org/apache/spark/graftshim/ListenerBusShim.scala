package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Accessor for the `private[spark]` listener-bus drain. Bench attributes
  * per-query input-metrics deltas by snapshotting a listener between
  * queries; a fixed sleep cannot guarantee the bus has delivered the last
  * stage's TaskEnd events (GC pause or a backlogged queue posts them after
  * the sleep and the delta bleeds into the NEXT query's counters), whereas
  * `waitUntilEmpty` is the exact condition. Same minimal-shim discipline
  * as `org.apache.spark.sql.graftshim.ColumnShim`.
  */
object ListenerBusShim {
  /** Block until every queued listener event is delivered, or the timeout
    * elapses (swallowed — metrics attribution is best-effort reporting,
    * never worth failing a benchmark run over).
    */
  def drain(sc: SparkContext, timeoutMillis: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMillis)
    catch { case _: java.util.concurrent.TimeoutException => }
}
