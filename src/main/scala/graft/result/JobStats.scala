package graft.result

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
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
    /** Key → rendered-JSON-value pairs — callers composing a larger object
      * (ApiServer's stats block) append their own pairs instead of slicing
      * the serialized string. */
    def fields: Seq[(String, String)] = Seq(
      "wallTimeMs" -> wallTimeMs.toString,
      "tasks" -> tasks.toString,
      "rowsScanned" -> rowsScanned.toString,
      "bytesScanned" -> bytesScanned.toString,
      "shuffleBytesWritten" -> shuffleBytesWritten.toString,
      "peakExecutionMemory" -> peakExecutionMemory.toString,
      "coreSecs" -> coreSecs.toString)
    def toJson: String = toJsonWith()
    /** The stats object with `extra` (pre-rendered JSON values) appended as
      * trailing keys. */
    def toJsonWith(extra: (String, String)*): String =
      (fields ++ extra).map { case (k, v) => s""""$k": $v""" }
        .mkString("{", ", ", "}")
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

  /** The local-property key that tags every Spark job submitted inside one
    * [[measure]] call with its measurement's identity. Local properties are
    * thread-local on the driver and Spark SQL re-applies the submitting
    * query's properties on its internal execution threads
    * (broadcast-exchange / subquery pools via SQLExecution's thread-local
    * capture), so AQE stages, broadcast builds and subqueries all carry
    * the tag. */
  private val MeasureIdKey = "graft.stats.measureId"
  private val measureSeq = new AtomicLong()

  /** Run `body` with a listener attached; returns its result plus the
    * aggregated task metrics of everything executed inside. Attribution is
    * per-measurement, not global (r15): the calling thread tags its jobs
    * with a unique local property, the listener collects that measurement's
    * stage ids at job start and counts ONLY tasks of those stages — so
    * concurrent queries (ApiServer's async/stream paths) no longer
    * cross-attribute rowsScanned/coreSecs, the cost basis (reference
    * parity: invoker/stats_builder.py prices each job's own tasks). */
  def measure[T](spark: SparkSession)(body: => T): (T, Snapshot) = {
    val tasks = new AtomicInteger
    val rows = new AtomicLong
    val bytes = new AtomicLong
    val shuffle = new AtomicLong
    val peak = new AtomicLong
    val runMs = new AtomicLong
    val measureId = s"m${measureSeq.incrementAndGet()}"
    val myStages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (e.properties != null && e.properties.getProperty(MeasureIdKey) == measureId)
          e.stageIds.foreach(id => myStages.add(id))
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null && myStages.contains(e.stageId)) {
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
    // Save/restore rather than set/clear: measure() nests (a probe
    // measuring a body that itself measures) and HTTP worker threads are
    // pooled — a leaked property would mis-tag the pool's next request.
    val outerId = spark.sparkContext.getLocalProperty(MeasureIdKey)
    spark.sparkContext.setLocalProperty(MeasureIdKey, measureId)
    val t0 = System.nanoTime()
    try {
      val result = body
      // Listener events post asynchronously. Every job inside `body`
      // completed before body returned, so its events are already POSTED;
      // one bounded bus drain makes them DELIVERED — exact, and ~ms where
      // the r1-r14 quiet-polling loop paid a fixed ~150ms of sleeps per
      // measured query (the dominant serving-path floor for small
      // queries). On timeout (5s — a flooded bus) proceed with what
      // arrived, the same contract the bounded polling loop had.
      org.apache.spark.GraftListenerBus.waitUntilEmpty(spark.sparkContext, 5000)
      (result, Snapshot((System.nanoTime() - t0) / 1000000, tasks.get(),
        rows.get(), bytes.get(), shuffle.get(), peak.get(), runMs.get()))
    } finally {
      spark.sparkContext.setLocalProperty(MeasureIdKey, outerId)
      spark.sparkContext.removeSparkListener(listener)
    }
  }
}
