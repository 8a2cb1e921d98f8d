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
 * Exchange+Window. (A bucketed-by-key layout does NOT remove that
 * exchange here, unlike the single-table engine windows — Union discards
 * the scans' bucketing in its output partitioning, measured 1 exchange
 * either way; the win a GroupedWriter layout buys this operator is
 * balanced, locality-friendly input splits, not a shuffle-free plan.)
 *
 * Tie semantics at equal timestamps: in non-strict mode an equal-time right
 * IS eligible, in strict mode it is not — controlled purely by whether
 * rights sort before or after lefts at the same time. Among right rows with
 * identical (keys, time), backward picks the last by `tieBreak` and forward
 * the first — pass a unique right column for determinism. Left rows with a
 * null time match nothing (nulls sort first).
 *
 * **Hot-key skew (`timeBucket`).** The plain plan partitions the window by
 * the keys alone, so ONE pathological key (bot user, null-ish default)
 * serializes all its rows through a single task's sort — the classic
 * window-skew failure at 100 TB. With `timeBucket = Some(width)` the sweep
 * runs in two passes instead: rows are windowed within (keys, floor(time /
 * width)) — a hot key's load spreads across its time buckets — and each
 * bucket's missing history is restored by a per-(key, bucket) carry table
 * (latest right before the bucket / earliest right after it), built by a
 * tiny aggregate + per-key window over one row per (key, bucket) and
 * joined back. Strictness is untouched: equal-time rows share a bucket, so
 * the in-bucket side-ordering still decides eligibility, and carried
 * rights are always from strictly earlier/later times. Results are
 * IDENTICAL to the plain mode (given a unique `tieBreak`); cost is one
 * extra pass over the input (the carry aggregate) and a join against the
 * carry table, whose size is bounded by distinct (key, bucket) — pick
 * `width` so a hot key's per-bucket row count fits a task's sort, i.e.
 * near (hot-key rows × width / time-span) ≈ a few million. A key whose
 * rows all share ONE instant still serializes — time bucketing cannot
 * split equal timestamps.
 *
 * Width selection is forgiving on the small side (measured, BENCH.md
 * §SkewScale, 10M rows / one key holding half): the ideal-width run took
 * 13.1 s vs the plain window's 34.1 s; a width 10× finer (carry table ≈
 * half the row count) cost 13.5 s; 100× finer — nearly every row alone in
 * its bucket, carry table ≈ the full row count, its join falling back from
 * broadcast to a shuffle join — still 15.7 s. Err toward too-fine rather
 * than too-coarse: the carry join degrades gracefully (AQE picks the join
 * strategy), while an oversized bucket recreates the single-task sort the
 * mode exists to avoid.
 */
object AsOfJoin {

  private val T    = "__graft_asof_t"
  private val SIDE = "__graft_asof_side"
  private val P    = "__graft_asof_p"
  private val B    = "__graft_asof_b"
  private val F    = "__graft_asof_f"
  private val BK   = "__graft_asof_bk"
  private val CB   = "__graft_asof_cb"
  private val CF   = "__graft_asof_cf"
  private val LASTR  = "__graft_asof_lastr"
  private val FIRSTR = "__graft_asof_firstr"

  /** @param rightVals right columns to attach, surfaced as `prefix+name`
    * @param tieBreak  right columns ordering equal-time right rows
    * @param timeBucket hot-key skew mode: window within (keys, time bucket)
    *   of this width plus a carry join, instead of by keys alone (see
    *   class doc). Same results, skew-proof task sizing.
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
      prefix: String = "asof_",
      timeBucket: Option[Long] = None): DataFrame =
    run(left, right, keys, leftTime, rightTime, rightVals, strict, tieBreak,
      prefix, wantBackward = true, wantForward = false, timeBucket)

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
      prefix: String = "asof_",
      timeBucket: Option[Long] = None): DataFrame =
    run(left, right, keys, leftTime, rightTime, rightVals, strict, tieBreak,
      prefix, wantBackward = false, wantForward = true, timeBucket)

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
      prefix: String = "asof_",
      timeBucket: Option[Long] = None): DataFrame =
    run(left, right, keys, leftTime, rightTime, rightVals, strict, tieBreak,
      prefix, wantBackward = true, wantForward = true, timeBucket)

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
      wantForward: Boolean,
      timeBucket: Option[Long]): DataFrame = {
    timeBucket.foreach(wd => require(wd > 0,
      s"timeBucket width must be positive, got $wd"))

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
    // timeBucket mode adds the carry-join key names (a function of
    // keys.length only), which would otherwise corrupt the carry join.
    val carryNames =
      if (timeBucket.isDefined)
        keys.indices.map(i => s"__graft_asof_ck_$i") :+ "__graft_asof_ckb"
      else Nil
    val clash = leftCols.toSet.intersect(
      (rightVals.map(prefix + _) ++
        Seq(T, SIDE, P, B, F, BK, CB, CF, LASTR, FIRSTR) ++
        tbNames ++ carryNames).toSet)
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
    // Skew mode adds the time bucket to the window partitioning — a hot
    // key's rows spread over its buckets instead of one task's sort.
    val partCols = if (timeBucket.isDefined) keys :+ BK else keys
    val part = Window.partitionBy(partCols.map(col): _*)
    val wb = part.orderBy(order(rightsBeforeLefts = !strict): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wf = part.orderBy(order(rightsBeforeLefts = strict): _*)
      .rowsBetween(1, Window.unboundedFollowing)

    var w = l.unionByName(r.select(l.columns.map(col): _*))
    // Carry columns restore each bucket's missing cross-bucket history:
    // CB = the key's latest right in any EARLIER bucket, CF = earliest
    // right in any LATER bucket. Built from one row per (key, bucket) —
    // max_by/min_by aggregates over the union (left rows contribute a null
    // ordering struct, so only rights count; buckets holding only lefts
    // still get a row, which the carry window needs), then a per-key
    // last/first(ignoreNulls) sweep ordered by bucket. Eligibility needs
    // no strictness logic: a carried right is from a strictly different
    // bucket, hence a strictly earlier/later time than every row in this
    // bucket. The in-bucket channel wins ties via coalesce (it is closer
    // by construction).
    var carryB: Column = lit(null)
    var carryF: Column = lit(null)
    timeBucket.foreach { width =>
      w = w.withColumn(BK, graft.util.Arith.floorDiv(col(T), width))
      val ordS = struct(col(T) +: tbNames.map(col): _*)
      val onRight = when(col(SIDE) === rightSide, ordS)
      val aggs =
        (if (wantBackward) Seq(max_by(col(P), onRight).as(LASTR)) else Nil) ++
        (if (wantForward) Seq(min_by(col(P), onRight).as(FIRSTR)) else Nil)
      val perBucket = w.groupBy((keys :+ BK).map(col): _*)
        .agg(aggs.head, aggs.tail: _*)
      val wk = Window.partitionBy(keys.map(col): _*).orderBy(col(BK).asc)
      val ckeys = keys.indices.map(i => s"__graft_asof_ck_$i")
      val ckb = "__graft_asof_ckb"
      val carry = perBucket.select(
        keys.zip(ckeys).map { case (k, ck) => col(k).as(ck) } ++
          Seq(col(BK).as(ckb)) ++
          (if (wantBackward)
            Seq(last(col(LASTR), ignoreNulls = true)
              .over(wk.rowsBetween(Window.unboundedPreceding, -1)).as(CB))
          else Nil) ++
          (if (wantForward)
            Seq(first(col(FIRSTR), ignoreNulls = true)
              .over(wk.rowsBetween(1, Window.unboundedFollowing)).as(CF))
          else Nil): _*)
      // Null-safe key equality: the window groups null keys together, so
      // the carry join must match them too (plain === would silently
      // starve null-key rows of their carry).
      val joinCond = (keys.zip(ckeys).map { case (k, ck) => col(k) <=> col(ck) } :+
        (col(BK) <=> col(ckb))).reduce(_ && _)
      w = w.join(carry, joinCond, "left")
        .drop((ckeys :+ ckb): _*)
      carryB = col(CB)
      carryF = col(CF)
    }
    def withCarry(channel: Column, carry: Column) =
      if (timeBucket.isDefined) coalesce(channel, carry) else channel
    if (wantBackward)
      w = w.withColumn(B, withCarry(last(col(P), ignoreNulls = true).over(wb), carryB))
    if (wantForward)
      w = w.withColumn(F, withCarry(first(col(P), ignoreNulls = true).over(wf), carryF))

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
