package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sessionization: split each group's event stream into sessions at
 * inactivity gaps larger than `maxGap` (same time unit as the timestamp
 * column). The classic events-table prep step — and for LLM training data,
 * the way interaction logs become per-conversation examples.
 *
 * Plan shape: ONE window partition by group id ordered by timestamp (lag →
 * boundary flag → running sum), i.e. the same single Exchange the
 * sequence/funnel plans use — with a group-bucketed source it disappears
 * entirely. Session assignment is deterministic even with tied timestamps:
 * exactly one row of a tie group carries the boundary flag and every tied
 * row sorts at-or-after it, so the running sum gives them all the same
 * session index regardless of engine-internal tie order.
 */
object Sessionize {

  /** Append a 0-based `session_idx` column per group. */
  def withSessionIds(df: DataFrame, gidCol: String, tsCol: String,
                     maxGap: Long): DataFrame = {
    val w = Window.partitionBy(col(gidCol)).orderBy(col(tsCol))
    val prev = lag(col(tsCol), 1).over(w)
    df.withColumn("__nb",
        when(prev.isNull || col(tsCol) - prev > maxGap, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("__nb")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
      .drop("__nb")
  }

  /** Per-session stats: (gid, session_idx, n_events, start_ts, end_ts). */
  def sessions(df: DataFrame, gidCol: String, tsCol: String,
               maxGap: Long): DataFrame =
    withSessionIds(df, gidCol, tsCol, maxGap)
      .groupBy(col(gidCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ts"), max(col(tsCol)).as("end_ts"))

  /** Per-group session summary: session count, largest session (events),
    * longest session (time span). All-integer outputs — engine-exact. */
  def groupSummary(df: DataFrame, gidCol: String, tsCol: String,
                   maxGap: Long): DataFrame =
    sessions(df, gidCol, tsCol, maxGap)
      .groupBy(col(gidCol))
      .agg(count(lit(1)).as("n_sessions"),
        max(col("n_events")).as("max_session_events"),
        max(col("end_ts") - col("start_ts")).as("longest_session_span"))
}
