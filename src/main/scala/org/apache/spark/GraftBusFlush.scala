package org.apache.spark

/** Deterministic listener-bus drain for [[graft.Bench]]'s observed-
  * metric attribution.
  *
  * `QueryExecutionListener` events ride the shared async
  * `LiveListenerBus`; a late-delivered `onSuccess` can otherwise
  * attribute an `observe` counter to the NEXT query sharing the metric
  * name. `LiveListenerBus.waitUntilEmpty()` is the bus's own
  * quiescence barrier (public), but the `SparkContext.listenerBus`
  * accessor is `private[spark]` — this one-method shim lives in the
  * `org.apache.spark` package purely to reach it. No Spark behavior is
  * altered or monkey-patched; the only proprietary-free dependency is
  * the public Spark source layout.
  */
object GraftBusFlush {
  /** Block until every queued listener event has been delivered.
    * Throws `TimeoutException` if the bus cannot drain (bounded
    * internally by Spark) — callers treat that as "flush failed,
    * fall back to polling". */
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
