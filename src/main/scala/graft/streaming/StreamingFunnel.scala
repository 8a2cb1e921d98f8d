package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One input event after projection: group, numeric ts, per-step filter hits. */
final case class StepEvent(groupId: Long, ts: Long, matches: Seq[Boolean])

/** [[StepEvent]] plus the watermarked event-time column, carried through the
  * projection UNTOUCHED: Spark only exposes the watermark to
  * flatMapGroupsWithState (`GroupState.getCurrentWatermarkMs`) when an
  * attribute bearing the watermark metadata survives into the operator's
  * child output — project it away and the watermark silently reads as
  * absent, so nothing would ever finalize. */
final case class StepEventT(groupId: Long, ts: Long, matches: Seq[Boolean],
                            et: java.sql.Timestamp)

/** Per-group funnel state: earliest feasible timestamp per completed step
  * (Long.MaxValue = step not yet reached). */
final case class FunnelProgress(groupId: Long, completedSteps: Int, anchors: Seq[Long])

/** One buffered not-yet-finalized event in the exact funnel's state. */
final case class BufferedStep(ts: Long, matches: Seq[Boolean])

/** State for [[StreamingFunnel.progressExact]]: `finalAnchors` is the fold
  * over the watermark-finalized prefix (immutable once written), `buffer`
  * holds events still inside the watermark horizon (re-folded provisionally
  * each batch), `finalizedThrough` is the ts horizon sealed so far, and
  * `lastEmitted` the last provisional anchors (emission change-detection). */
final case class FunnelExactState(
    finalAnchors: Seq[Long],
    buffer: Seq[BufferedStep],
    finalizedThrough: Long,
    lastEmitted: Seq[Long])

/**
 * Streaming funnel — an EXTENSION beyond the reference (which has no
 * streaming surface at all, SURVEY.md §2.9), expressing the same
 * chained-min-timestamp sequence semantics as the batch engine
 * (graft.engine.QueryEngine sequenceCols) incrementally over a stream.
 *
 * Two variants, one semantics:
 *
 *  - [[progress]] — O(numSteps) state per group, greedy: exact when each
 *    group's events arrive in event-time order ACROSS batches (each batch
 *    is sorted internally). A late event that would retroactively improve
 *    an earlier step's anchor does not re-evaluate later steps, because
 *    the raw events are not retained. Use when the input is (near-)ordered
 *    and state size is the binding constraint.
 *  - [[progressExact]] — exact under ARBITRARY cross-batch disorder up to
 *    the watermark horizon: events buffer in state until the watermark
 *    proves nothing earlier can arrive, then fold permanently into the
 *    anchors in global event-time order. State per group is
 *    O(numSteps + events inside the watermark horizon) — bounded by the
 *    horizon, NOT by stream length, which is what makes it viable on an
 *    unbounded stream. Events arriving later than an already-sealed
 *    horizon are dropped (standard watermark lateness semantics; the
 *    batch engine run over the same non-late event set agrees exactly).
 */
object StreamingFunnel {

  /** The batch engine's chained-min fold, shared by both variants and the
    * provisional/finalized split: processing events in ascending-ts order,
    * anchors(s) converges to min{ts : matches(s) ∧ ts > anchors(s-1)} —
    * the same nested window minima `sequenceCols` computes (strict `>`,
    * so same-timestamp events do not advance steps). Exactness of the
    * finalized/buffer split: every finalized ts is smaller than every
    * buffered ts, so folding the finalized prefix first and the sorted
    * buffer on top equals one fold over the full sorted set. */
  private[streaming] def foldInto(anchors: Array[Long],
                                  sortedEvents: Iterator[BufferedStep]): Unit = {
    val n = anchors.length
    sortedEvents.foreach { e =>
      var s = 0
      while (s < n) {
        if (e.matches(s)) {
          val prevReached = s == 0 || anchors(s - 1) != Long.MaxValue
          val strictlyAfter = s == 0 || e.ts > anchors(s - 1)
          if (prevReached && strictlyAfter && e.ts < anchors(s)) anchors(s) = e.ts
        }
        s += 1
      }
    }
  }

  /** The typed state rows key a LONG group id and long ts; a string gid
    * (reference-valid for the BATCH engine) would null under the cast and
    * collapse every group's state onto one key — reject loudly instead
    * (the SequenceMatch/Ann r12 guard, streaming edition). */
  private def requireIntegral(events: DataFrame, c: String, what: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = events.schema(events.schema.fieldIndex(c)).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"streaming funnel $what column '$c' must be integral, is " +
        s"${dt.simpleString} — its typed state rows key long ids; map the " +
        "column to a long before the stream")
  }

  private def project(events: DataFrame, groupIdCol: String, tsCol: String,
                      stepPredicates: Seq[Column]): Dataset[StepEvent] = {
    requireIntegral(events, groupIdCol, "group id")
    requireIntegral(events, tsCol, "timestamp")
    val spark = events.sparkSession
    import spark.implicits._
    events.select(
      col(groupIdCol).cast("long").as("groupId"),
      col(tsCol).cast("long").as("ts"),
      array(stepPredicates.map(p => coalesce(p, lit(false))): _*).as("matches"))
      .as[StepEvent]
  }

  /** Project a (streaming or batch) events frame and fold it into per-group
    * funnel progress updates, greedily (see the object scaladoc for the
    * in-order contract). Emits a row whenever a group's progress changes. */
  def progress(events: DataFrame, groupIdCol: String, tsCol: String,
               stepPredicates: Seq[Column]): Dataset[FunnelProgress] = {
    val spark = events.sparkSession
    import spark.implicits._
    val n = stepPredicates.size
    project(events, groupIdCol, tsCol, stepPredicates)
      .groupByKey(_.groupId)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (gid: Long, it: Iterator[StepEvent], state: GroupState[FunnelProgress]) => {
          val prev = state.getOption.getOrElse(
            FunnelProgress(gid, 0, Seq.fill(n)(Long.MaxValue)))
          val anchors = prev.anchors.toArray
          foldInto(anchors,
            it.map(e => BufferedStep(e.ts, e.matches)).toArray.sortBy(_.ts).iterator)
          val completed = anchors.takeWhile(_ != Long.MaxValue).length
          val next = FunnelProgress(gid, completed, anchors.toIndexedSeq)
          if (next != prev) { state.update(next); Iterator.single(next) }
          else Iterator.empty
        })
  }

  /** Disorder-exact streaming funnel (see the object scaladoc): exact
    * against the batch engine under arbitrary cross-batch event disorder,
    * up to the watermark horizon.
    *
    * `eventTimeCol` must be a timestamp column derived monotonically from
    * `tsCol`; `delay` is the watermark delay applied to it.
    * `watermarkToTs` maps a watermark value (epoch MILLIS, Spark's
    * watermark unit) to the smallest `tsCol` value a non-late event can
    * still carry — e.g. `ms => ms * 1000000L` when ts is epoch nanos and
    * eventTime is its microsecond truncation, or
    * `ms => Math.floorDiv(ms + 999, 1000)` when ts is epoch seconds. It
    * must be monotone; events with ts below the mapped horizon fold
    * permanently, everything above stays buffered and is re-folded
    * provisionally each batch.
    *
    * Emitted `completedSteps` is monotone per group: anchors are minima
    * over a growing event set, so they only ever decrease and the
    * completed-step count only ever grows — `max(completedSteps)` over the
    * update stream IS the final state however the input is batched. */
  def progressExact(events: DataFrame, groupIdCol: String, tsCol: String,
                    eventTimeCol: String, delay: String,
                    stepPredicates: Seq[Column],
                    watermarkToTs: Long => Long): Dataset[FunnelProgress] = {
    val spark = events.sparkSession
    import spark.implicits._
    val n = stepPredicates.size
    requireIntegral(events, groupIdCol, "group id")
    requireIntegral(events, tsCol, "timestamp")
    events.withWatermark(eventTimeCol, delay)
      .select(
        col(groupIdCol).cast("long").as("groupId"),
        col(tsCol).cast("long").as("ts"),
        array(stepPredicates.map(p => coalesce(p, lit(false))): _*).as("matches"),
        col(eventTimeCol).as("et")) // bare attribute: watermark metadata survives
      .as[StepEventT]
      .groupByKey(_.groupId)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (gid: Long, it: Iterator[StepEventT], state: GroupState[FunnelExactState]) => {
          val prev = state.getOption.getOrElse(FunnelExactState(
            Seq.fill(n)(Long.MaxValue), Nil, Long.MinValue,
            Seq.fill(n)(Long.MaxValue)))
          // Watermark BEFORE this batch (Spark advances it between batches,
          // so nothing in `it` can be behind horizon-after-this-batch yet).
          // Batch execution / no-watermark streams report nothing usable:
          // everything stays buffered, which is still exact.
          val wmMs = try state.getCurrentWatermarkMs()
                     catch { case _: UnsupportedOperationException => Long.MinValue }
          val horizon = math.max(prev.finalizedThrough,
            if (wmMs == Long.MinValue) Long.MinValue else watermarkToTs(wmMs))
          // Events behind an already-sealed horizon are LATE beyond the
          // watermark: drop (their region's fold is immutable).
          val fresh = it.filter(_.ts >= prev.finalizedThrough)
            .map(e => BufferedStep(e.ts, e.matches))
          val all = (prev.buffer ++ fresh).sortBy(_.ts)
          val (toSeal, toKeep) = all.partition(_.ts < horizon)
          val anchors = prev.finalAnchors.toArray
          foldInto(anchors, toSeal.iterator)          // permanent prefix
          val provisional = anchors.clone()
          foldInto(provisional, toKeep.iterator)      // horizon re-fold
          val completed = provisional.takeWhile(_ != Long.MaxValue).length
          state.update(FunnelExactState(
            anchors.toIndexedSeq, toKeep, horizon, provisional.toIndexedSeq))
          if (!provisional.sameElements(prev.lastEmitted))
            Iterator.single(FunnelProgress(gid, completed, provisional.toIndexedSeq))
          else Iterator.empty
        })
  }
}
