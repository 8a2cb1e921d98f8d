package org.apache.spark

/**
 * Scala-visibility shim: `SparkContext.listenerBus` is `private[spark]`,
 * so the one call graft needs — "block until every event posted so far has
 * been delivered to every listener" — is re-exported here from inside the
 * spark package. Used by [[graft.result.JobStats.measure]] to settle task
 * metrics exactly: every job inside a measured body has COMPLETED before
 * the body returns, so its task-end events are already posted; one bus
 * drain makes them delivered. This replaces a quiet-polling loop whose
 * 3×50ms sleeps put a ~150ms fixed floor on every measured query — the
 * dominant per-request overhead for small serving-path queries.
 */
object GraftListenerBus {
  /** Wait up to `timeoutMs` for the listener bus to drain; returns false
    * on timeout (caller proceeds with possibly-incomplete metrics, same
    * contract as the bounded polling loop this replaced). */
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
