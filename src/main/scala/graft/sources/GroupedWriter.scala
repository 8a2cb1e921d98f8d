package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.{col, date_from_unix_date, expr}

/**
 * Data-prep writers reproducing the reference's physical layout guarantees.
 *
 * The reference requires every group's rows in exactly one file and ships an
 * offline map/reduce repartitioner for it (dataprep_example/repartition.py —
 * 246 lines of hand-rolled bucketing). In Spark each is one statement:
 *
 *  - [[repartitionByGroup]]: hash-partition by group id → each group lands
 *    in exactly one output file (the reference's invariant, S7).
 *  - [[bucketBy]]: the stronger Spark-native layout — bucketed + sorted
 *    table. A per-group query (window/groupBy on the group id) over a
 *    bucketed table plans with NO Exchange: the 100 TB shuffle-free story,
 *    equivalent to the reference's Lambda-per-file model but managed by the
 *    planner instead of by convention.
 *
 * Siblings beyond the reference's layouts: [[ZOrder.zorderWrite]] clusters
 * on SEVERAL columns at once (min/max pruning on every interleaved dim)
 * and [[DatasetExporter.compact]] re-bins a fragmented layout shuffle-free.
 */
object GroupedWriter {

  /** One file per hash bucket of the group id; all rows of a group co-located.
    * `nParts` sizes output files (reference guidance: 20-150 MB each). */
  def repartitionByGroup(df: DataFrame, groupIdCol: String, nParts: Int,
                         path: String): Unit =
    df.repartition(nParts, col(groupIdCol))
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Hive-style day-partitioned layout: adds a `dt` DATE partition column
    * derived from the epoch-nanos timestamp and writes one directory per
    * day. The 100 TB timeframe story: row-group stats pushdown (S2) still
    * skips within files, but a `dt=...` directory layout lets the planner
    * skip whole days without listing their files — declare the column via
    * `DatasetSpec(dayPartitionColumn = Some("dt"))` and
    * [[graft.engine.QueryEngine]] derives its bounds from any query
    * timeframe. The day is computed from integer epoch days
    * (`date_from_unix_date`), NOT `to_date`, so the layout and the derived
    * bounds are both independent of the writer/reader session timezones.
    * `nParts` bounds output files per day (each day's rows are
    * hash-clustered by `groupIdCol` into at most `nParts` files).
    *
    * Declare `DatasetSpec.dayPartitionColumn` only for layouts whose dt
    * was derived exactly this way — a layout written by another tool (or a
    * session-timezone `to_date`) can disagree near midnights, and the
    * derived bounds would silently prune valid rows. `Catalog.register`'s
    * declaration path validates this against the data; direct library use
    * is on the caller. */
  def partitionByDay(df: DataFrame, tsNanosCol: String, groupIdCol: String,
                     nParts: Int, path: String): Unit =
    df.withColumn("dt", dayOfTsNanos(col(tsNanosCol)))
      .repartition(nParts, col("dt"), col(groupIdCol))
      .write.mode(SaveMode.Overwrite).partitionBy("dt").parquet(path)

  /** DATE of an epoch-nanos timestamp via integer epoch days — THE single
    * writer/reader day-derivation contract: [[partitionByDay]] writes it,
    * [[graft.engine.QueryEngine]] derives pruning bounds with it, and
    * [[graft.catalog.Catalog]] validates `dayPartitionColumn` declarations
    * against it. One definition, because the derived bounds are only a safe
    * superset of the row filter if both sides agree bit-for-bit.
    * Timezone-free by construction (no to_date/session zone), exact at any
    * magnitude (util.Arith.floorDiv, not double division). */
  def dayOfTsNanos(tsNanos: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    date_from_unix_date(
      graft.util.Arith.floorDiv(
        graft.util.Arith.floorDiv(tsNanos, 1000L), 86400000000L).cast("int"))

  /** Bucketed+sorted managed table; downstream per-group aggregations and
    * joins on `groupIdCol` skip the shuffle entirely. Extra `sortCols`
    * (typically the timestamp) extend the in-bucket sort order: with one
    * file per bucket — guaranteed by the pre-write repartition — the scan
    * reports its output ordering, so window plans over
    * (groupIdCol, sortCols...) skip the per-query SORT as well as the
    * exchange. At 100 TB that turns every sequence/funnel/sessionization
    * query into a pure map-side pass.
    *
    * Readers must set `spark.sql.legacy.bucketedTableScan.outputOrdering=
    * true` to exploit the sort: Spark ≥3.0 ignores bucket sort order by
    * default because it cannot be trusted with multiple files per bucket —
    * exactly what the repartition here rules out. */
  def bucketBy(df: DataFrame, groupIdCol: String, nBuckets: Int,
               table: String, sortCols: String*): Unit =
    df.repartition(nBuckets, col(groupIdCol)) // one file per bucket
      .write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, groupIdCol)
      .sortBy(groupIdCol, sortCols: _*)
      .option("path", s"spark-warehouse/$table")
      .saveAsTable(table)
}
