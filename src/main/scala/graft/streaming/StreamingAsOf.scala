package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Streaming as-of enrichment — the continuous-ingest counterpart of
 * [[graft.operators.AsOfJoin.backward]]: attach to each streaming event the
 * latest static reference row at-or-before the event's time (price as of
 * trade time, model version as of request time).
 *
 * The batch operator's union+window plan cannot run on a stream (windows
 * over non-time ordering are unsupported there), so the static side is
 * reformulated ONCE, in batch, into validity INTERVALS: each reference row
 * is valid from its own time until the key's next reference row (`lead`
 * over the key). "Latest at-or-before" then becomes a plain stream-static
 * LEFT join on key + half-open containment — which Structured Streaming
 * executes STATELESS: no watermark, no state store, the static side simply
 * joins (broadcast when small) against every micro-batch. Equal-time
 * reference rows collapse exactly like the batch tie rule: earlier rows
 * get zero-width (empty) intervals, the last by `tieBreak` wins.
 */
object StreamingAsOf {

  /** @param right     STATIC reference frame (re-derived per micro-batch
    *                  only if its source changes; precompute + persist for
    *                  a fixed table)
    * @param rightVals right columns surfaced as `prefix+name`
    * @param tieBreak  right columns breaking equal-time ties (last wins)
    */
  def backward(
      events: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String],
      tieBreak: Seq[String] = Nil,
      prefix: String = "asof_"): DataFrame = {
    // Same collision guard as the batch operator: an events column named
    // like an output payload (or internal) column would produce duplicate
    // output columns the first downstream select trips over.
    val clash = events.columns.toSet.intersect(
      (rightVals.map(prefix + _) ++
        Seq("__graft_valid_from", "__graft_valid_to") ++
        keys.map(k => s"__graft_rk_$k")).toSet)
    require(clash.isEmpty,
      s"events columns collide with as-of output/internal names: ${clash.mkString(", ")} " +
        "(pick a different prefix)")
    val ord = (col(rightTime) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val rKeys = keys.map(k => s"__graft_rk_$k")
    val intervals = right
      .select(
        keys.zip(rKeys).map { case (k, rk) => col(k).as(rk) } ++
          Seq(col(rightTime).as("__graft_valid_from"),
            lead(col(rightTime), 1).over(w).as("__graft_valid_to")) ++
          rightVals.map(v => col(v).as(prefix + v)): _*)
    // Null-safe key equality: the batch operator's Window.partitionBy
    // groups null keys together and matches them; a plain === here would
    // silently diverge (null === null is null, matching nothing).
    val cond = keys.zip(rKeys)
      .map { case (k, rk) => events.col(k) <=> col(rk) }
      .reduce(_ && _) &&
      events.col(leftTime) >= col("__graft_valid_from") &&
      (col("__graft_valid_to").isNull ||
        events.col(leftTime) < col("__graft_valid_to"))
    events.join(intervals, cond, "left")
      .drop((rKeys :+ "__graft_valid_from" :+ "__graft_valid_to"): _*)
  }
}
