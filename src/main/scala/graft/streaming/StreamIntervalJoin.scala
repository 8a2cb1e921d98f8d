package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Watermarked stream-stream interval join: each left event joins right
 * events with equal keys and `rightTs` in the half-open window
 * `[leftTs, leftTs + window)` — in-flight attribution (clicks landing in
 * the 24 h after each purchase) without waiting for a batch job. The batch
 * counterpart is [[graft.operators.RangeJoin]]; `st_attribution` pins this
 * plan against the SAME DuckDB oracle as `q_range_join`.
 *
 * Spark's stream-stream inner join keeps BOTH sides' rows in the state
 * store until the watermark proves no further match can arrive; the
 * event-time range condition is what lets it evict — right rows age out
 * `window` after their event time passes the watermark, left rows as soon
 * as their window closes behind it (the state-cleanup contract of
 * stream-stream joins with event-time conditions). State is therefore
 * O(input rate × (window + watermark delay)), independent of stream
 * lifetime — the property that makes this viable on an unbounded stream.
 *
 * Inner-join matches emit as soon as both sides have arrived (append
 * mode), so on a finite input the emitted set equals the batch join —
 * aggregations over matches belong downstream of the sink, where they run
 * as plain batch aggregations (aggregating INSIDE the streaming query
 * would switch emission to watermark-finalized append, which never emits
 * the final batch's groups on a bounded run).
 *
 * Both inputs must carry proper event-time timestamp columns; non-key
 * column names must be disjoint (loud failure below, the RangeJoin rule).
 */
object StreamIntervalJoin {

  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, window: String,
           watermark: String): DataFrame = {
    val shared = left.columns.toSet.intersect(right.columns.toSet) -- keys
    require(shared.isEmpty,
      s"left and right share non-key columns: ${shared.mkString(", ")} (rename one side)")
    val rk = keys.indices.map(i => s"__graft_sij_k_$i")
    require(!(left.columns ++ right.columns).exists(rk.contains),
      s"column names ${rk.mkString(", ")} are reserved by StreamIntervalJoin")
    val l = left.withWatermark(leftTs, watermark)
    var r = right.withWatermark(rightTs, watermark)
    for ((k, n) <- keys.zip(rk)) r = r.withColumnRenamed(k, n)
    val cond = (keys.zip(rk).map { case (k, n) => col(k) === col(n) } ++
      Seq(col(rightTs) >= col(leftTs),
        col(rightTs) < col(leftTs) + expr(s"INTERVAL $window"))).reduce(_ && _)
    l.join(r, cond, "inner").drop(rk: _*)
  }
}
