package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One input event after projection: group, numeric ts, per-step filter hits. */
final case class StepEvent(groupId: Long, ts: Long, matches: Seq[Boolean])

/** Per-group funnel state: earliest feasible timestamp per completed step
  * (Long.MaxValue = step not yet reached). */
final case class FunnelProgress(groupId: Long, completedSteps: Int, anchors: Seq[Long])

/**
 * Streaming funnel — an EXTENSION beyond the reference (which has no
 * streaming surface at all, SURVEY.md §2.9), expressing the same
 * chained-min-timestamp sequence semantics as the batch engine
 * (graft.engine.QueryEngine sequenceCols) incrementally over a stream.
 *
 * State per group is O(numSteps) (just the anchor timestamps), updated with
 * `flatMapGroupsWithState` in Update mode: arbitrarily many users stream
 * through with bounded memory — the 100 TB-friendly design. Semantics match
 * the batch engine exactly when events arrive in event-time order within a
 * group (each micro-batch is sorted internally); a late event that would
 * retroactively improve an *earlier* step's anchor does not re-evaluate
 * later steps (the raw events are not retained). This greedy trade-off is
 * standard for streaming funnels and is documented here deliberately.
 */
object StreamingFunnel {

  /** Project a (streaming or batch) events frame and fold it into per-group
    * funnel progress updates. Emits a row whenever a group's progress
    * changes. */
  def progress(events: DataFrame, groupIdCol: String, tsCol: String,
               stepPredicates: Seq[Column]): Dataset[FunnelProgress] = {
    val spark = events.sparkSession
    import spark.implicits._
    val n = stepPredicates.size
    val typed = events.select(
      col(groupIdCol).cast("long").as("groupId"),
      col(tsCol).cast("long").as("ts"),
      array(stepPredicates.map(p => coalesce(p, lit(false))): _*).as("matches"))
      .as[StepEvent]

    typed.groupByKey(_.groupId)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (gid: Long, it: Iterator[StepEvent], state: GroupState[FunnelProgress]) => {
          val prev = state.getOption.getOrElse(
            FunnelProgress(gid, 0, Seq.fill(n)(Long.MaxValue)))
          val anchors = prev.anchors.toArray
          // In-batch event-time ordering; strict ts > previous anchor, as in
          // the batch engine (same-timestamp events do not advance steps).
          it.toArray.sortBy(_.ts).foreach { e =>
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
          val completed = anchors.takeWhile(_ != Long.MaxValue).length
          val next = FunnelProgress(gid, completed, anchors.toIndexedSeq)
          if (next != prev) { state.update(next); Iterator.single(next) }
          else Iterator.empty
        })
  }
}
