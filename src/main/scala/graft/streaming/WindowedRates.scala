package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Event-time windowed aggregation with watermarking — the standard
 * Structured Streaming surface (readStream → withWatermark → window → agg)
 * over the same events model the batch engine queries. Extension beyond the
 * reference (no streaming there, SURVEY.md §2.9).
 *
 * State is bounded by the watermark: windows older than `watermarkDelay`
 * behind the max observed event time are finalized and dropped, so the
 * query runs indefinitely with O(active windows × keys) state — the
 * 100 TB-stream-friendly shape. Late rows within the delay are merged into
 * their window; later ones are discarded (documented, standard semantics).
 */
object WindowedRates {

  /** Per-(window, key) row counts and measure sums. `tsCol` must be a
    * TimestampType column (cast epoch-nanos longs with
    * `timestamp_micros(col / 1000)` or similar before calling). */
  def perWindow(events: DataFrame, tsCol: String, keyCol: String,
                measureCol: String, windowLength: String,
                watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLength).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col(measureCol)).as("sum_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col(keyCol), col("n_events"), col("sum_value"))
}
