package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming sessionization — the continuous counterpart of
 * [[graft.operators.Sessionize]]: Spark's native `session_window` merges
 * events into per-group sessions that close after `gap` of inactivity,
 * with state bounded by the watermark (a session finalizes once the
 * watermark passes its end, so state per group is only the open session).
 * Emits one row per closed session: (group, session start/end, n_events).
 */
object StreamingSessions {

  /** Per-session event counts over a stream. `tsCol` must be a timestamp
    * column; results arrive when the watermark closes each session. */
  def sessionCounts(events: DataFrame, gidCol: String, tsCol: String,
                    gap: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(col(gidCol), session_window(col(tsCol), gap).as("session"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(gidCol), col("session.start").as("session_start"),
        col("session.end").as("session_end"), col("n_events"))
}
