package graft.delta

import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Collects `Dataset.observe` metrics from a write executed inside `body` —
  * the mechanism that lets DML compute its metrics IN the rewrite pass
  * instead of re-scanning (or re-joining) the inputs a second time.
  *
  * The listener bus is asynchronous, so the observed row arrives after the
  * action returns; `run` blocks (bounded) on a latch keyed by the metric
  * name. Names should be call-unique (UUID-suffixed) so concurrent queries
  * in the session cannot cross-talk. */
private[graft] object ObservedMetrics {

  /** Execute `body` (typically a write of a DataFrame carrying
    * `.observe(name, ...)`) and return its result plus the observed row.
    * `None` when no metric with `name` was reported within the wait —
    * callers must treat that as "unknown" and fall back to recomputing. */
  def run[T](spark: SparkSession, name: String)(body: => T): (T, Option[Row]) = {
    val captured = new AtomicReference[Option[Row]](None)
    val latch = new CountDownLatch(1)
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = {
        val row = qe.observedMetrics.get(name)
        if (row.isDefined) { captured.set(row); latch.countDown() }
      }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val result = body
      latch.await(30, TimeUnit.SECONDS)
      (result, captured.get)
    } finally {
      spark.listenerManager.unregister(listener)
    }
  }
}
