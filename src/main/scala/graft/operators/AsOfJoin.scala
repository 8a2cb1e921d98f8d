package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Backward (point-in-time) as-of join — a whole-operator primitive Spark has
 * no built-in for. For every left row, attach the single most recent right
 * row with `rightTime <= leftTime` (`<` when strict), matching on equi-keys:
 * the classic "price as of trade time" / "last touchpoint before conversion"
 * lookup. The reference engine has no join surface at all
 * (docs/operating.md:322-325), but its sequence machinery
 * (frocket/engine/query_engine.py:217-249) is built on the same
 * "latest-prior-event per group" primitive this operator generalizes.
 *
 * Implementation: NOT a join. Both sides are union-tagged and swept by ONE
 * window pass per key — `last(payload, ignoreNulls=true) OVER (PARTITION BY
 * keys ORDER BY time, side[, tieBreak] ROWS UNBOUNDED PRECEDING TO 1
 * PRECEDING)`. Right rows carry their payload, left rows carry null, so the
 * window's last non-null IS the as-of match. Cost: one shuffle on the keys
 * plus one sort — no range explosion, no per-key collect, no O(L×R)
 * candidate pairs. At 100 TB both sides stream through a single
 * Exchange+Window; on a layout bucketed+sorted by the keys even the
 * exchange disappears (see sources.GroupedWriter).
 *
 * Tie semantics at equal timestamps: non-strict orders right rows before
 * left rows (an equal-time right IS eligible); strict orders them after
 * (it is not). Among right rows with identical (keys, time), the match is
 * the last by `tieBreak` — pass a unique right column for determinism.
 * Left rows with a null time match nothing (nulls sort first).
 */
object AsOfJoin {

  private val T    = "__graft_asof_t"
  private val SIDE = "__graft_asof_side"

  /** @param rightVals right columns to attach, surfaced as `prefix+name`
    * @param tieBreak  right columns ordering equal-time right rows (last wins)
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
      prefix: String = "asof_"): DataFrame = {

    // Non-strict: rights sort before lefts at equal time (eligible).
    // Strict: lefts first, so an equal-time right falls outside the frame.
    val (leftSide, rightSide) = if (strict) (0, 1) else (1, 0)
    val tbNames = tieBreak.indices.map(i => s"__graft_asof_tb_$i")

    val leftCols = left.columns.toSeq
    val rightSchema = right.schema

    var l = left
      .withColumn(T, col(leftTime))
      .withColumn(SIDE, lit(leftSide))
    for (v <- rightVals)
      l = l.withColumn(prefix + v, lit(null).cast(rightSchema(v).dataType))
    for ((tb, n) <- tieBreak.zip(tbNames))
      l = l.withColumn(n, lit(null).cast(rightSchema(tb).dataType))

    var r = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as(T), lit(rightSide).as(SIDE)) ++
        rightVals.map(v => col(v).as(prefix + v)) ++
        tieBreak.zip(tbNames).map { case (tb, n) => col(tb).as(n) }: _*)
    for (c <- leftCols if !keys.contains(c))
      r = r.withColumn(c, lit(null).cast(left.schema(c).dataType))

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy((Seq(col(T), col(SIDE)) ++ tbNames.map(col)).map(_.asc): _*)
      .rowsBetween(Window.unboundedPreceding, -1)

    var u = l.unionByName(r.select(l.columns.map(col): _*))
    for (v <- rightVals)
      u = u.withColumn(prefix + v, last(col(prefix + v), ignoreNulls = true).over(w))

    u.where(col(SIDE) === leftSide)
      .select(leftCols.map(col) ++ rightVals.map(v => col(prefix + v)): _*)
  }
}
