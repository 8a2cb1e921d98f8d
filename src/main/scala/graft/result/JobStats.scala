package graft.result

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/**
 * Execution stats via SparkListener — the Spark-native stand-in for the
 * reference's per-task metric labels + invoker stats builder
 * (frocket/common/metrics.py, frocket/invoker/stats_builder.py; response
 * "stats" block in docs/api.md). Spark already measures everything the
 * reference hand-instruments; this just snapshots task metrics around one
 * query execution.
 */
object JobStats {

  final case class Snapshot(
      wallTimeMs: Long,
      tasks: Int,
      rowsScanned: Long,
      bytesScanned: Long,
      shuffleBytesWritten: Long,
      peakExecutionMemory: Long,
      executorRunMs: Long) {
    /** Engine-appropriate analog of the reference's per-query cost estimate
      * (invoker/stats_builder.py:42+, api.md "cost"): the reference prices
      * Lambda GB-seconds; on Spark the billable unit is executor-core time,
      * so report summed task run time as core-seconds. Cluster $/query =
      * coreSecs x the deployment's per-core-second rate. */
    def coreSecs: Double = executorRunMs / 1000.0
    def toJson: String =
      s"""{"wallTimeMs": $wallTimeMs, "tasks": $tasks, "rowsScanned": $rowsScanned, """ +
      s""""bytesScanned": $bytesScanned, "shuffleBytesWritten": $shuffleBytesWritten, """ +
      s""""peakExecutionMemory": $peakExecutionMemory, "coreSecs": $coreSecs}"""
  }

  /** The scale probes' steady-state convention: run `body` twice and keep
    * the faster run's (result, snapshot) — even after a warmup, the first
    * full-occupancy pass at a new input size carries residual
    * JIT/page-cache warm-in on ambient-noisy hosts (measured up to 2.5×).
    */
  def minOf2[T](body: => (T, Snapshot)): (T, Snapshot) = {
    val a = body; val c = body
    if (c._2.wallTimeMs < a._2.wallTimeMs) c else a
  }

  /** Run `body` with a listener attached; returns its result plus the
    * aggregated task metrics of everything executed inside. The driver
    * serializes query execution, so global task accumulation is the query's
    * own (same trade-off as the reference's per-job metric bags). */
  def measure[T](spark: SparkSession)(body: => T): (T, Snapshot) = {
    val tasks = new AtomicInteger
    val rows = new AtomicLong
    val bytes = new AtomicLong
    val shuffle = new AtomicLong
    val peak = new AtomicLong
    val runMs = new AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          tasks.incrementAndGet()
          rows.addAndGet(m.inputMetrics.recordsRead)
          bytes.addAndGet(m.inputMetrics.bytesRead)
          shuffle.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          peak.accumulateAndGet(m.peakExecutionMemory, Math.max(_, _))
          // Run time, not CPU time: a core blocked on shuffle I/O is still
          // a core the deployment pays for.
          runMs.addAndGet(m.executorRunTime)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    try {
      val result = body
      // Listener events post asynchronously and the bus-drain API is
      // private[spark]; settle by waiting for the task counter to go quiet.
      // The loop is bounded by ITERATIONS (max ~5s), never by the counter
      // value — a query can legitimately run far more than 1000 tasks.
      var prev = -1
      var settled = 0
      var iters = 0
      while (settled < 2 && iters < 100) {
        val cur = tasks.get()
        if (cur == prev) settled += 1 else settled = 0
        prev = cur
        iters += 1
        Thread.sleep(50)
      }
      (result, Snapshot((System.nanoTime() - t0) / 1000000, tasks.get(),
        rows.get(), bytes.get(), shuffle.get(), peak.get(), runMs.get()))
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
