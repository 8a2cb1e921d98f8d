package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One input event after projection: tumbling-window start (epoch micros),
  * state bucket, key, and the watermarked event-time attribute (see
  * [[StepEventT]] for why it must survive projection). */
final case class WindowedKey(windowUs: Long, bucket: Int, key: String,
                             et: java.sql.Timestamp)

/** One Space-Saving counter: `count` is an overestimate of the key's true
  * frequency by at most `err` (the count the key inherited on eviction). */
final case class HitterCounter(key: String, count: Long, err: Long)

final case class HitterState(entries: Seq[HitterCounter])

/** One emitted update: the key's current Space-Saving estimate within its
  * (window, bucket) summary. Counts only grow while a key stays resident,
  * so `max(count)` per (window, key) over the update stream equals the
  * final estimate whenever no eviction touched the key (the exact regime —
  * see [[StreamingTopK.heavyHitters]]). */
final case class HitterUpdate(windowUs: Long, key: String, count: Long, err: Long)

/**
 * Windowed heavy hitters with BOUNDED state — Space-Saving (Metwally,
 * Agrawal, El Abbadi, "Efficient computation of frequent and top-k
 * elements in data streams", ICDT 2005) per tumbling event-time window,
 * an extension beyond the reference (no streaming surface, SURVEY.md
 * §2.9): "what are the top event types / domains / tokens per hour" over
 * an unbounded stream whose key cardinality may be unbounded too.
 *
 * Why not a plain streaming `groupBy(window, key).count()`: its state is
 * O(active windows × DISTINCT KEYS) — an adversarial or just heavy-tailed
 * key column (URLs, user agents) grows state without bound within a
 * window. Space-Saving caps state at `m` counters per summary with the
 * classic guarantees: every key's true count n(k) satisfies
 * `count(k) − err(k) ≤ n(k) ≤ count(k)` for resident keys, and any key
 * with n(k) > N/m (N = events in the summary) is GUARANTEED resident —
 * so the true top-k are never silently lost, only possibly accompanied.
 * When the summary never fills (cardinality ≤ m), every err is 0 and the
 * result is EXACT counting — the regime the battery query pins against
 * its DuckDB oracle; the m-bounded regime is covered by the guarantee
 * assertions in StreamFuzzSpec.
 *
 * Scale shape: the state key is (window, hash(key) mod `buckets`), NOT
 * just the window — a single hot window (the current hour at production
 * rate) would otherwise serialize through ONE state partition's task.
 * Each key lives in exactly one bucket, so per-window summaries across
 * buckets partition the key space and their union is merge-free; state is
 * O(ACTIVE windows × buckets × m), independent of stream length and key
 * cardinality: each summary arms an event-time timeout at
 * windowEnd + delay, and once the watermark proves no non-late event can
 * touch the window again the summary is REMOVED (its final counts were
 * already emitted as updates; a beyond-lateness straggler can only
 * recreate a partial summary whose lower counts the max-per-key post-pass
 * ignores). Per-batch work per group is one hash-map fold over the
 * batch's pre-counted keys (sorted fold order + lexicographic min-victim
 * rule ⇒ deterministic under any batching, which is what lets
 * StreamFuzzSpec pin batching-invariance in the exact regime).
 */
object StreamingTopK {

  /** Fold a batch of (key, add) increments into a Space-Saving summary of
    * capacity `m`. Deterministic: increments fold in key order, and the
    * evicted victim is the (count, key)-lexicographic minimum. */
  private[graft] def foldCounts(entries: Seq[HitterCounter],
                                    adds: Seq[(String, Long)],
                                    m: Int): Seq[HitterCounter] = {
    val map = mutable.LinkedHashMap.from(entries.map(e => e.key -> (e.count, e.err)))
    adds.sortBy(_._1).foreach { case (k, w) =>
      map.get(k) match {
        case Some((c, e)) => map.update(k, (c + w, e))
        case None if map.size < m => map.update(k, (w, 0L))
        case None =>
          val (vk, (vc, _)) = map.minBy { case (key, (c, _)) => (c, key) }
          map.remove(vk)
          map.update(k, (vc + w, vc))
      }
    }
    map.iterator.map { case (k, (c, e)) => HitterCounter(k, c, e) }.toSeq
  }

  /**
   * Space-Saving heavy hitters per tumbling `windowDur` window of
   * `eventTimeCol`, summarizing `keyCol` with `m` counters in each of
   * `buckets` hash-partitioned summaries. Emits a [[HitterUpdate]] for
   * every counter whose estimate changed in a micro-batch (update mode).
   * In the exact regime (per-bucket distinct keys ≤ m) counts are
   * monotone per key, so `max(count) GROUP BY (windowUs, key)` over the
   * sink followed by a rank is the batch `groupBy(window, key).count()`
   * top-k verbatim.
   */
  def heavyHitters(events: DataFrame, eventTimeCol: String, keyCol: String,
                   windowDur: String, delay: String,
                   m: Int, buckets: Int): Dataset[HitterUpdate] = {
    require(m > 0 && buckets > 0, "m and buckets must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val windowUs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(windowDur))
    require(windowUs.months == 0 && windowUs.days == 0,
      "tumbling window must be a sub-day duration")
    val wUs = windowUs.microseconds
    val delayUs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(delay))
    require(delayUs.months == 0, "watermark delay must be month-free")
    val delayMs = delayUs.days * 86400000L + delayUs.microseconds / 1000L
    events.withWatermark(eventTimeCol, delay)
      .select(
        // Integer floor-to-window (event times are post-1970 here; a
        // pre-epoch stream would need floorDiv) — no float in the bucket.
        expr(s"(unix_micros($eventTimeCol) div ${wUs}L) * ${wUs}L").as("windowUs"),
        pmod(xxhash64(col(keyCol)), lit(buckets)).cast("int").as("bucket"),
        col(keyCol).cast("string").as("key"),
        col(eventTimeCol).as("et")) // bare attribute: watermark metadata survives
      .as[WindowedKey]
      .groupByKey(e => (e.windowUs, e.bucket))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
        (wk: (Long, Int), it: Iterator[WindowedKey], state: GroupState[HitterState]) => {
          if (state.hasTimedOut) {
            // Watermark passed windowEnd + delay: no non-late event can
            // touch this window again. Final counts were already emitted.
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(HitterState(Nil))
            val batchCounts = mutable.Map.empty[String, Long]
            it.foreach(e => batchCounts.update(e.key, batchCounts.getOrElse(e.key, 0L) + 1L))
            val next = foldCounts(prev.entries, batchCounts.toSeq, m)
            state.update(HitterState(next))
            // Arm the seal. The timestamp must sit above the current
            // watermark (Spark rejects already-passed timeouts); a
            // straggler arriving with the watermark already past the seal
            // point re-arms one watermark tick ahead. Batch execution has
            // neither watermark nor timeouts — skip silently (exact there
            // anyway: one "batch" sees everything).
            try {
              val wm = try state.getCurrentWatermarkMs()
                       catch { case _: UnsupportedOperationException => Long.MinValue }
              val seal = Math.addExact(Math.floorDiv(wk._1 + wUs, 1000L), delayMs)
              state.setTimeoutTimestamp(math.max(seal, wm + 1))
            } catch {
              case _: UnsupportedOperationException | _: ArithmeticException => ()
            }
            val before = prev.entries.map(e => e.key -> (e.count, e.err)).toMap
            next.iterator
              .filter(e => !before.get(e.key).contains((e.count, e.err)))
              .map(e => HitterUpdate(wk._1, e.key, e.count, e.err))
          }
        })
  }
}
