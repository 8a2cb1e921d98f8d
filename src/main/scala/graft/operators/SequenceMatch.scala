package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.query.QueryAst.SequenceStep

/**
 * Single-pass sequence matching via a typed [[Aggregator]] — the SURVEY
 * §2.8 alternative to the engine's chained-window plan (QueryEngine
 * sequenceCols). Identical semantics: step 0 anchor = min ts of step-0
 * rows; step i anchor = min ts of step-i rows STRICTLY after anchor i-1;
 * a group matches when the last anchor exists.
 *
 * Why an aggregator: the window plan shuffles and sorts EVERY row of every
 * group, then runs one window pass per step. This aggregator reduces each
 * partition to per-step sorted timestamp lists (only rows matching some
 * step survive the partial aggregation — highly selective funnels shuffle
 * a tiny fraction of the data and skip the sort entirely), then resolves
 * the anchor chain once per group at merge time. Rows matching no step
 * contribute nothing. Trade-off: buffer memory is O(matching rows per
 * group per step); for dense steps the window plan is the better choice —
 * both are exposed, benchmarked, and semantically interchangeable.
 *
 * WHEN TO USE WHICH (measured at 250M rows / 3.75M groups, 6 selective
 * steps, local[32] — BENCH.md §"Sequence at reference scale"): with the
 * flat-buffer shape below this aggregator wins on BOTH layouts — 13.5s
 * vs the window stack's 30.0s on plain parquet (2.2×), 8.0s vs 22.8s
 * bucketed (2.8×) — the window plan pays a per-partition SORT of all
 * 250M rows plus six window passes even when bucketing removes its
 * exchange, while this path sorts nothing and scans only the ~10%
 * candidate rows. The window plan stays the engine DEFAULT because it
 * covers negated steps (which this path rejects), feeds per-row flags
 * to downstream aggregations, and wins at small inputs (sf0.1: typed
 * aggregation's fixed overhead makes this ~20% slower). Rule: reach for
 * SequenceMatch on selective multi-step funnels at scale, either
 * layout.
 *
 * Hot-group resilience (measured, same probe at 30%-hot, r11 buffers):
 * because only candidate rows reach a group's merge, a bot group
 * holding 30% of the corpus degrades this path 1.66× (15.1s → 25.0s)
 * where the window stack degrades 5.2× — the candidate filter is also
 * the skew guard, as long as the bot's rows mostly DON'T match the
 * steps.
 */
object SequenceMatch {

  /** Per-group buffer: ONE flat primitive long array of (ts, step) pairs
    * plus a fill count — 16 bytes per candidate element and a single
    * array header per GROUP, not per step. The previous shape (one array
    * per step + a sizes array + Kryo object-graph encoding) carried
    * ~600 B of fixed overhead per group, which at reference scale
    * (250M rows / 3.75M groups — BENCH.md §"Sequence at reference
    * scale") pushed the aggregation maps past the 8 GiB default heap and
    * demanded SPARK_DRIVER_MEM=48g; this shape runs the same probes in
    * the DEFAULT 8 GiB (the 3-step uniform-control probe wants 12 GiB —
    * 3.75M small buffers cost more per entry than one bot group's big
    * array) and is 2.4× faster besides. The flat pair layout + a product
    * (UnsafeRow) encoder instead of Kryo cuts per-group overhead to one
    * object + one array and serializes as a single primitive-array
    * column — no object graph, no Kryo copy buffers. Appends double
    * capacity (amortized O(1)); merges concat exactly, so shuffled
    * partials carry no slack. */
  final case class Buf(var data: Array[Long], var n: Int)

  private final class SeqAgg(numSteps: Int, maxDuration: Option[Long])
      extends Aggregator[(Long, Array[Boolean]), Buf, Boolean] {

    override def zero: Buf = Buf(Array.emptyLongArray, 0)

    override def reduce(b: Buf, row: (Long, Array[Boolean])): Buf = {
      val (ts, matches) = row
      var s = 0
      while (s < numSteps) {
        if (matches(s)) {
          if (b.n + 2 > b.data.length)
            b.data = java.util.Arrays.copyOf(b.data, math.max(8, b.data.length * 2))
          b.data(b.n) = ts
          b.data(b.n + 1) = s.toLong
          b.n += 2
        }
        s += 1
      }
      b
    }

    override def merge(a: Buf, b: Buf): Buf = {
      val out = new Array[Long](a.n + b.n)
      System.arraycopy(a.data, 0, out, 0, a.n)
      System.arraycopy(b.data, 0, out, a.n, b.n)
      a.data = out
      a.n += b.n
      a
    }

    override def finish(b: Buf): Boolean = {
      // One linear min-scan per step instead of a per-step sort: anchor_s
      // = min { ts tagged s : ts > anchor_{s-1} } (step 0: plain min).
      // O(numSteps · candidates) per group with no allocation — cheaper
      // than sorting for sparse groups and within a small factor of it
      // for dense ones.
      var anchor = 0L
      var first = 0L
      var s = 0
      while (s < numSteps) {
        var best = 0L
        var found = false
        var i = 0
        while (i < b.n) {
          val ts = b.data(i)
          if (b.data(i + 1) == s.toLong && (s == 0 || ts > anchor) &&
              (!found || ts < best)) { best = ts; found = true }
          i += 2
        }
        if (!found) return false
        anchor = best
        if (s == 0) first = best
        s += 1
      }
      maxDuration.forall(d => anchor - first <= d)
    }

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Boolean] = Encoders.scalaBoolean
  }

  /** Group ids (column `gid`) whose rows satisfy the step sequence. Rows
    * matching no step are filtered out BEFORE the aggregation, so the
    * shuffle carries only candidate rows. */
  def matchingGroups(df: DataFrame, gidCol: String, tsCol: String,
                     steps: Seq[SequenceStep],
                     maxDuration: Option[Long] = None): DataFrame = {
    require(steps.forall(_.rowFound),
      "negated (rowFound=false) steps need visibility of non-matching rows; use the window plan")
    val spark = df.sparkSession
    import spark.implicits._
    val engine = new graft.engine.QueryEngine(graft.engine.DatasetSpec(gidCol, tsCol))
    val preds = steps.map(s => s.filters.map(engine.compileFilter).reduce(_ && _))
    val projected = df.select(
      col(gidCol).cast("long").as("g"),
      col(tsCol).cast("long").as("t"),
      array(preds.map(p => coalesce(p, lit(false))): _*).as("m"))
      .where(expr("exists(m, x -> x)")) // drop rows matching no step pre-shuffle
      .as[(Long, Long, Array[Boolean])]
    val agg = new SeqAgg(steps.size, maxDuration)
    projected
      .groupByKey(_._1)
      .mapValues { case (_, t, m) => (t, m) }
      .agg(agg.toColumn.name("passed"))
      .filter(_._2)
      .map(_._1)
      .toDF(gidCol)
  }
}
