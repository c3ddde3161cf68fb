package org.apache.spark

/** Bridge into `private[spark]` core internals: the listener-bus flush
  * the bench telemetry needs. Spark delivers task-end events on an async
  * queue, so a per-query telemetry window read immediately after an
  * action can miss the tail tasks; `waitUntilEmpty` (the hook Spark's
  * own test harness uses) makes the window exact. Kept to a one-liner so
  * the core-internal surface is this file (the sql-internal one is
  * [[org.apache.spark.sql.GraftBridge]]).
  */
object GraftListenerBridge {
  def flushListenerBus(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
