package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (point-in-time) joins — a whole-operator primitive Spark has no
 * built-in for. For every left row, attach the single nearest right row in
 * time, matching on equi-keys: the classic "price as of trade time" /
 * "last touchpoint before conversion" lookup. The reference engine has no
 * join surface at all (docs/operating.md:322-325), but its sequence
 * machinery (frocket/engine/query_engine.py:217-249) is built on the same
 * "latest-prior-event per group" primitive [[backward]] generalizes.
 *
 * Three directions, mirroring the pandas `merge_asof` surface:
 *  - [[backward]]: latest right with `rightTime <= leftTime` (< if strict)
 *  - [[forward]]:  earliest right with `rightTime >= leftTime` (> if strict)
 *  - [[nearest]]:  whichever of the two is closer in time (ties → backward)
 *
 * Implementation: NOT a join. Both sides are union-tagged and swept by a
 * window pass per direction — `last(payload, ignoreNulls)` over a `ROWS …
 * PRECEDING` frame for backward, `first(...)` over a `… FOLLOWING` frame
 * for forward (nearest runs both and picks the closer). Right rows carry
 * their payload, left rows carry null, so the frame's nearest non-null IS
 * the as-of match. Cost: ONE shuffle on the keys plus one in-partition
 * sort per direction — no range explosion, no per-key collect, no O(L×R)
 * candidate pairs. At 100 TB both sides stream through a single
 * Exchange+Window; on a layout bucketed+sorted by the keys even the
 * exchange disappears (see sources.GroupedWriter).
 *
 * Tie semantics at equal timestamps: in non-strict mode an equal-time right
 * IS eligible, in strict mode it is not — controlled purely by whether
 * rights sort before or after lefts at the same time. Among right rows with
 * identical (keys, time), backward picks the last by `tieBreak` and forward
 * the first — pass a unique right column for determinism. Left rows with a
 * null time match nothing (nulls sort first).
 */
object AsOfJoin {

  private val T    = "__graft_asof_t"
  private val SIDE = "__graft_asof_side"
  private val P    = "__graft_asof_p"
  private val B    = "__graft_asof_b"
  private val F    = "__graft_asof_f"

  /** @param rightVals right columns to attach, surfaced as `prefix+name`
    * @param tieBreak  right columns ordering equal-time right rows
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String],
      strict: Boolean = false,
      tieBreak: Seq[String] = Nil,
      prefix: String = "asof_"): DataFrame =
    run(left, right, keys, leftTime, rightTime, rightVals, strict, tieBreak,
      prefix, wantBackward = true, wantForward = false)

  /** Earliest right row at-or-after (after, if strict) each left row. */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String],
      strict: Boolean = false,
      tieBreak: Seq[String] = Nil,
      prefix: String = "asof_"): DataFrame =
    run(left, right, keys, leftTime, rightTime, rightVals, strict, tieBreak,
      prefix, wantBackward = false, wantForward = true)

  /** Closest right row in either direction; equal distance resolves to the
    * backward (prior) match, like pandas `merge_asof(direction='nearest')`.
    * Strict mode excludes exact-equal timestamps from BOTH directions. */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String],
      strict: Boolean = false,
      tieBreak: Seq[String] = Nil,
      prefix: String = "asof_"): DataFrame =
    run(left, right, keys, leftTime, rightTime, rightVals, strict, tieBreak,
      prefix, wantBackward = true, wantForward = true)

  private def run(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String],
      strict: Boolean,
      tieBreak: Seq[String],
      prefix: String,
      wantBackward: Boolean,
      wantForward: Boolean): DataFrame = {

    // Side-ordering encodes eligibility of equal-time rights per direction:
    // backward non-strict needs rights BEFORE lefts at equal time (inside
    // the PRECEDING frame), strict needs them after; forward is the exact
    // mirror (non-strict needs them AFTER, inside the FOLLOWING frame).
    // The two directions therefore sort OPPOSITE ways at equal time — each
    // gets its own window ordering. Spark plans this as one Exchange on the
    // keys feeding one in-partition sort per direction; a frame trick on a
    // shared sort cannot express both (masking the wrong-side hit loses the
    // next-best candidate, not just the ineligible one).
    val (leftSide, rightSide) = (0, 1)
    val tbNames = tieBreak.indices.map(i => s"__graft_asof_tb_$i")

    val leftCols = left.columns.toSeq
    // A left column named like an output payload or ANY internal channel
    // column would be silently overwritten/shadowed — fail loudly instead.
    val clash = leftCols.toSet.intersect(
      (rightVals.map(prefix + _) ++
        Seq(T, SIDE, P, B, F) ++ tbNames).toSet)
    require(clash.isEmpty,
      s"left columns collide with as-of output/internal names: ${clash.mkString(", ")} " +
        s"(pick a different prefix)")
    val rightSchema = right.schema
    // The right time rides along for nearest's distance compare (and is
    // harmless otherwise).
    val valNames = (rightVals :+ rightTime).distinct
    // The payload travels as ONE struct, null on left rows and never null
    // on right rows — so last/first(ignoreNulls) match WHOLE right rows.
    // Per-column channels would tear a match whose own payload value is
    // null, backfilling it from an older/newer right row.
    val pType = org.apache.spark.sql.types.StructType(
      valNames.map(v => org.apache.spark.sql.types.StructField(
        v, rightSchema(v).dataType)))

    var l = left
      .withColumn(T, col(leftTime))
      .withColumn(SIDE, lit(leftSide))
      .withColumn(P, lit(null).cast(pType))
    for ((tb, n) <- tieBreak.zip(tbNames))
      l = l.withColumn(n, lit(null).cast(rightSchema(tb).dataType))

    // A null-time right can never be "nearest in time" — drop it up front
    // (its interior frame position would otherwise shadow real matches).
    var r = right.where(col(rightTime).isNotNull).select(
      keys.map(col) ++
        Seq(col(rightTime).as(T), lit(rightSide).as(SIDE),
          struct(valNames.map(v => col(v).as(v)): _*).as(P)) ++
        tieBreak.zip(tbNames).map { case (tb, n) => col(tb).as(n) }: _*)
    for (c <- leftCols if !keys.contains(c))
      r = r.withColumn(c, lit(null).cast(left.schema(c).dataType))

    // rights before lefts at equal time ⇔ SIDE descending (right=1 first).
    def order(rightsBeforeLefts: Boolean) =
      col(T).asc +:
        (if (rightsBeforeLefts) col(SIDE).desc else col(SIDE).asc) +:
        tbNames.map(col(_).asc)
    val part = Window.partitionBy(keys.map(col): _*)
    val wb = part.orderBy(order(rightsBeforeLefts = !strict): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wf = part.orderBy(order(rightsBeforeLefts = strict): _*)
      .rowsBetween(1, Window.unboundedFollowing)

    var w = l.unionByName(r.select(l.columns.map(col): _*))
    if (wantBackward)
      w = w.withColumn(B, last(col(P), ignoreNulls = true).over(wb))
    if (wantForward)
      w = w.withColumn(F, first(col(P), ignoreNulls = true).over(wf))

    // Each direction's sort already admits exactly the eligible rights, so
    // channel values need no masking; nearest only compares distances.
    val b = col(B)
    val f = col(F)
    // Distances compare in DECIMAL for integral time columns: a raw long
    // subtraction silently wraps in non-ANSI mode when the left time and a
    // match sit near opposite Long extremes, flipping which side is
    // "nearest" (the util.Arith exact-integer discipline). Non-integral time
    // types (timestamps) subtract to intervals, which cannot wrap.
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val widen: Column => Column = left.schema(leftTime).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        c => c.cast("decimal(38,0)")
      case _ => identity
    }
    val chosen: Column =
      if (wantBackward && wantForward)
        when(b.isNotNull && (f.isNull ||
          (widen(col(T)) - widen(b.getField(rightTime))) <=
            (widen(f.getField(rightTime)) - widen(col(T)))), b)
          .otherwise(f)
      else if (wantBackward) b
      else f

    // A null-time left row sorts to the partition head, where the
    // FOLLOWING frame would hand it the earliest right — mask it: no
    // timestamp, no match, in any direction.
    val out = w.withColumn(P, when(col(T).isNotNull, chosen))

    out.where(col(SIDE) === leftSide)
      .select(leftCols.map(col) ++
        rightVals.map(v => col(P).getField(v).as(prefix + v)): _*)
  }
}
