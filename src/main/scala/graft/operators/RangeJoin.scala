package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Interval (range) join: points ⋈ intervals on equi-keys AND
 * `lo <= point < hi`, without the cartesian/BroadcastNestedLoop plan Spark
 * produces for a raw theta join. (The reference has no join surface; this is
 * one of the extension operators a Spark-native engine should provide —
 * attribution windows, session containment, IP-range lookups.)
 *
 * Implementation — coarse-bucket equi-join: both sides are mapped to
 * fixed-width time buckets. An interval covers `ceil(span/width)`
 * consecutive buckets (exploded via `sequence()`); a point falls in exactly
 * one, so every qualifying (point, interval) pair is generated exactly once
 * and needs no post-dedup. The join is then a plain equi-join on
 * (keys, bucket) + the exact range predicate. Candidate count is
 * |points| + Σ ceil(span/width) — linear, never quadratic — and the shuffle
 * partitions by (keys, bucket), so a hot key's load spreads across time
 * buckets instead of landing on one reducer. Pick `bucketWidth` near the
 * typical interval span: wider buckets mean fewer interval replicas but
 * more false candidates for the exact filter.
 */
object RangeJoin {

  private val B = "__graft_range_bucket"

  /** Inner range join; output columns = points ++ intervals (minus the
    * shared keys). Empty intervals (`hi <= lo`) match nothing. Intervals
    * are half-open: `lo <= point < hi`.
    *
    * @param maxBucketsPerInterval guard on interval span vs `bucketWidth`:
    *   an interval covering more buckets than this fails the job with a
    *   RangeJoin-attributed error naming the width, instead of (a) an
    *   opaque `sequence()` error past Spark's ~2^31 element limit or
    *   (b) a legal-but-huge span silently exploding candidate volume by
    *   millions of replicas. Raise it deliberately when spans really are
    *   that wide relative to the chosen width.
    */
  def join(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      pointCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Long,
      maxBucketsPerInterval: Long = 1L << 20): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    // Shared non-key names would make the range predicate ambiguous after
    // the equi-join — fail loudly instead of letting Spark pick a side.
    val shared = points.columns.toSet
      .intersect(intervals.columns.toSet) -- keys
    require(shared.isEmpty,
      s"points and intervals share non-key columns: ${shared.mkString(", ")} " +
        "(rename one side)")
    // The internal bucket column on EITHER side alone would be silently
    // overwritten and dropped — same loud-failure policy.
    require(!points.columns.contains(B) && !intervals.columns.contains(B),
      s"column name $B is reserved by RangeJoin")
    // Exact integer floor-div (util.Arith): double division would put a raw
    // ns-epoch (~1.7e18, above 2^53) within ~100ns of a bucket boundary in
    // the wrong bucket and silently drop the pair.
    def bucketOf(c: org.apache.spark.sql.Column) =
      graft.util.Arith.floorDiv(c, bucketWidth)
    val p = points.withColumn(B, bucketOf(col(pointCol)))
    // hi is exclusive so the last covered bucket holds hi-1; the hi<=lo
    // guard keeps sequence() ascending (it would otherwise count DOWN and
    // fabricate buckets for an empty interval).
    // The span guard runs BEFORE sequence(): a too-wide interval fails
    // with an error naming this operator and the width choice (lazy CASE
    // branches keep raise_error unevaluated on passing rows).
    val nBuckets = bucketOf(col(hiCol) - 1) - bucketOf(col(loCol)) + 1
    val i = intervals
      .where(col(hiCol) > col(loCol))
      .withColumn(B, explode(
        when(nBuckets > maxBucketsPerInterval, raise_error(concat(
          lit("RangeJoin: interval covers "), nBuckets.cast("string"),
          lit(s" buckets of width $bucketWidth (limit $maxBucketsPerInterval)" +
            " — widen bucketWidth or raise maxBucketsPerInterval"))))
        .otherwise(sequence(
          bucketOf(col(loCol)),
          bucketOf(col(hiCol) - 1)))))
    p.join(i, (keys :+ B).toSeq)
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop(B)
  }
}
