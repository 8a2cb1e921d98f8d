package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming exact dedup — the continuous-ingest counterpart of
 * [[graft.operators.Dedup.exact]]: keep the first occurrence of each
 * distinct payload, drop later duplicates.
 *
 * State is a hash per distinct payload, bounded by the event-time
 * watermark: `dropDuplicatesWithinWatermark` guarantees exact dedup for
 * duplicates arriving within the watermark delay of each other and expires
 * state afterwards — without the watermark the state would grow with every
 * distinct document ever seen, which cannot run forever at ingest scale.
 * Deduping on the md5 of the content (not the content itself) keeps state
 * rows small regardless of document size.
 */
object StreamingDedup {

  /** First occurrence of each distinct `textCol` payload within the
    * watermark horizon. `tsCol` must be a timestamp column. */
  def firstOccurrences(docs: DataFrame, tsCol: String, textCol: String,
                       watermarkDelay: String): DataFrame =
    docs
      .withColumn("__content_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__content_hash")
      .drop("__content_hash")
}
