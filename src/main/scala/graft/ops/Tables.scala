package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/**
 * Test-table access for the driver contract ([[graft.SparkEntry]]).
 *
 * The engine's timestamp contract is the reference's "timestamp is an opaque
 * number at any scale" model (frocket/common/validation/query_validator.py:
 * 268-299): event-time columns are epoch-nanos LongType, and every
 * comparison/min/max/div works unchanged. Parquet can deliver that natively
 * (TIMESTAMP(NANOS) + the nanos-as-long legacy flag, or plain int64), but
 * driver-regenerated testdata stores `ts` as µs-precision TIMESTAMP_NTZ —
 * so [[tsToNanos]] normalizes ANY timestamp-typed column to epoch-nanos long
 * at load time, interpreting naive timestamps as UTC (the same reading
 * DuckDB's `epoch_ns(ts)` gives the oracle side). Precision: TIMESTAMP and
 * TIMESTAMP_NTZ are µs internally, so the produced nanos are exact µs
 * multiples and the µs-truncation contracts (`ts div 1000` both sides) hold
 * trivially.
 *
 * Scale note: normalization is a projection, so a timeframe filter on the
 * derived nanos column no longer reaches the raw scan's row-group stats.
 * The 100 TB path is unaffected: like the reference (which REQUIRES
 * registered, group-partitioned data), scale layouts are written by
 * [[graft.sources.GroupedWriter]] from the normalized frame, store ts as
 * int64 nanos, and get full pushdown + day-partition pruning
 * (fr_timeframe_pruned pins the plan).
 */
object Tables {

  /** Normalize every TIMESTAMP/TIMESTAMP_NTZ column of `df` to epoch-nanos
    * LongType (UTC interpretation for naive timestamps — enforced via the
    * session timezone set in [[loadRaw]]). No-op for already-numeric ts. */
  def tsToNanos(df: DataFrame): DataFrame = {
    // Wherever normalization happens, the pushdown rule must too — the
    // Catalog/CLI/ApiServer sessions don't go through loadRaw, and without
    // the rule every timeframe over a TIMESTAMP-typed source full-scans.
    installPushdown(df.sparkSession)
    val tsCols = df.schema.fields.collect {
      case f if f.dataType == TimestampType || f.dataType == TimestampNTZType => f.name
    }
    tsCols.foldLeft(df) { (d, c) =>
      d.withColumn(c, unix_micros(col(c).cast(TimestampType)) * lit(1000L))
    }
  }

  /** Raw read: source schema untouched (the file-stream source needs the
    * on-disk schema; [[tsToNanos]] is then applied on top of the stream). */
  def loadRaw(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Runtime-settable SQLConf; harmless for non-nanos tables. UTC pins the
    // TIMESTAMP_NTZ -> epoch interpretation to DuckDB's epoch_ns reading.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    installPushdown(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Idempotent runtime install of [[graft.plans.TimeframePushdown]] (for
    * sessions built without spark.sql.extensions=GraftExtensions): timeframe
    * bounds on tsToNanos-derived columns reach the parquet row-group stats. */
  def installPushdown(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(graft.plans.TimeframePushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.TimeframePushdown
  }

  /** Untouched load: tables queried with NATIVE date/timestamp semantics
    * (the TPC-H relational set — q3/q6 compare `o_orderdate`/`l_shipdate`
    * as dates) keep their on-disk types; only the event-time tables below
    * carry the opaque-nanos contract. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    loadRaw(spark, sfDir, name)

  def events(spark: SparkSession, sfDir: String): DataFrame    = tsToNanos(load(spark, sfDir, "events"))
  def documents(spark: SparkSession, sfDir: String): DataFrame = tsToNanos(load(spark, sfDir, "documents"))
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = tsToNanos(load(spark, sfDir, "embeddings"))
}
