package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Package-private-Spark accessor: block until the async listener bus has
  * delivered every queued event. Bench attributes per-query CPU from task
  * metrics delivered on that bus; without a drain, a query's last tasks'
  * CPU would land on the NEXT query's counter. `listenerBus` and
  * `waitUntilEmpty` are `private[spark]`, hence this one-file shim in the
  * org.apache.spark namespace (the standard test-harness idiom — Spark's
  * own suites call exactly this). Never used on a query's timed path. */
object ListenerDrain {
  def drain(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: Throwable => () }
}
