package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/**
 * One-pass column profiler — the "what's in this 100 TB directory" pass
 * that precedes every pipeline decision (schema drift checks, null-rate
 * alarms, join-key cardinality estimates, partition-count sizing). One
 * aggregation job computes, per requested column: non-null/null counts,
 * distinct count, min/max (typed), and an order-independent sum — emitted
 * in long form, one row per column, so downstream tooling can diff
 * profiles across snapshots with a plain join.
 *
 * Determinism contract: counts and string min/max are exact in any
 * engine; numeric sums go through a DECIMAL(20,4) cast (exact,
 * order-independent partial aggregation — the FrQueries/Relational money
 * contract), so a 1000-executor Spark profile matches a single-node
 * oracle bit-for-bit. Non-numeric non-string columns (timestamps, dates,
 * booleans) are profiled via their STRING cast, which both engines format
 * identically for these types under the session's UTC pin.
 *
 * Shape at 100 TB: ONE scan of only the requested columns (column-pruned
 * — verify `ReadSchema` lists exactly `cols`), partial aggregation
 * map-side, a single merged row on the driver, then a constant-space
 * explode to long form. The one cost knob is distinct counting:
 *  - `approxDistinct = false` (exact) plans the classic multi-distinct
 *    Expand — the scan's rows are replicated once per profiled column
 *    before the partial aggregate. Exact, but data×cols intermediate
 *    volume: the small-table / audit mode.
 *  - `approxDistinct = true` swaps in HLL++ sketches
 *    (`approx_count_distinct`): no Expand, one pass, mergeable fixed-size
 *    state per column — the 100 TB default. Deterministic for a given
 *    dataset (register-max merges are order-independent), but HLL
 *    estimates are engine-specific, so the battery gates this mode by
 *    error bound against the exact profile (`q_profile_approx_err`), not
 *    by hash.
 */
object Profile {

  private val nullS = lit(null).cast("string")
  private val nullD = lit(null).cast("double")
  private val nullL = lit(null).cast("long")

  /** `rsd` is the HLL++ relative standard deviation knob for
    * `approxDistinct = true` (memory ~ 1/rsd² registers per column —
    * 2% costs ~2.5k registers/column, still constant in data size). */
  def profile(df: DataFrame, cols: Seq[String],
              approxDistinct: Boolean = false, rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")

    def distinctAgg(c: String): Column =
      if (approxDistinct) approx_count_distinct(col(c), rsd).cast("long")
      else count_distinct(col(c))

    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
      val base = Seq(
        count(col(c)).as(s"__${c}__nn"),
        distinctAgg(c).as(s"__${c}__nd"))
      val typed = df.schema(c).dataType match {
        case _: NumericType => Seq(
          min(col(c)).cast("double").as(s"__${c}__minn"),
          max(col(c)).cast("double").as(s"__${c}__maxn"),
          sum(col(c).cast("decimal(20,4)")).cast("double").as(s"__${c}__sum"))
        case StringType => Seq(
          min(col(c)).as(s"__${c}__mins"),
          max(col(c)).as(s"__${c}__maxs"),
          sum(length(col(c))).cast("long").as(s"__${c}__slen"))
        case _ => Seq(
          min(col(c).cast("string")).as(s"__${c}__mins"),
          max(col(c).cast("string")).as(s"__${c}__maxs"))
      }
      base ++ typed
    }

    val row = df.agg(aggs.head, aggs.tail: _*)

    val structs = cols.map { c =>
      def m(s: String) = col(s"__${c}__$s")
      val (minS, maxS, minN, maxN, sumN, sLen) = df.schema(c).dataType match {
        case _: NumericType =>
          (nullS, nullS, m("minn"), m("maxn"), m("sum"), nullL)
        case StringType =>
          (m("mins"), m("maxs"), nullD, nullD, nullD, m("slen"))
        case _ =>
          (m("mins"), m("maxs"), nullD, nullD, nullD, nullL)
      }
      struct(
        lit(c).as("column"),
        m("nn").as("n_nonnull"),
        (col("__n") - m("nn")).as("n_null"),
        m("nd").as("n_distinct"),
        minS.as("min_str"), maxS.as("max_str"),
        minN.as("min_num"), maxN.as("max_num"), sumN.as("sum_num"),
        sLen.as("sum_len"))
    }
    row.select(explode(array(structs: _*)).as("p")).select("p.*")
  }

  /**
   * Schema-level drift between two snapshots: added / removed /
   * type-changed columns, one row each — the check that runs BEFORE
   * [[drift]] (statistics only make sense over columns both sides
   * share). Pure metadata (two parquet footers at any data size); a
   * DataFrame for uniformity with the other profile outputs.
   */
  def schemaDrift(before: DataFrame, after: DataFrame): DataFrame = {
    import org.apache.spark.sql.{Row, types => T}
    Seq("before" -> before, "after" -> after).foreach { case (side, df) =>
      val dup = df.schema.fieldNames.groupBy(identity).collect {
        case (nm, occ) if occ.length > 1 => nm
      }
      require(dup.isEmpty,
        s"$side frame has duplicated column names (${dup.mkString(", ")}) — " +
          "a name-keyed drift report would silently collapse them")
    }
    val b = before.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val a = after.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val rows =
      (a.keySet -- b.keySet).toSeq.sorted.map(c => Row(c, "added", null, a(c))) ++
      (b.keySet -- a.keySet).toSeq.sorted.map(c => Row(c, "removed", b(c), null)) ++
      (b.keySet & a.keySet).toSeq.sorted.collect {
        case c if a(c) != b(c) => Row(c, "type_changed", b(c), a(c))
      }
    val schema = T.StructType(Seq(
      T.StructField("column", T.StringType), T.StructField("status", T.StringType),
      T.StructField("before_type", T.StringType), T.StructField("after_type", T.StringType)))
    before.sparkSession.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
  }

  /**
   * Snapshot drift: join two profiles of the same columns (yesterday's
   * corpus vs today's, raw vs cleaned) and emit per-column deltas — the
   * alarm input every scheduled pipeline wants ("null rate jumped",
   * "distinct cardinality halved", "value range shifted"). Pure
   * arithmetic over the two bounded profile rows per column; the heavy
   * lifting is the two one-pass profiles themselves.
   *
   * Output per column: row counts and distinct counts side by side with
   * deltas, the null-RATE change in parts-per-million (integer — one
   * exact division each side at micro resolution, engine-identical), and
   * whether the [min,max] range moved (numeric and string ranges
   * compared in their own domains).
   */
  def drift(before: DataFrame, after: DataFrame, cols: Seq[String],
            approxDistinct: Boolean = false): DataFrame = {
    val b = profile(before, cols, approxDistinct)
      .select(col("column"),
        (col("n_nonnull") + col("n_null")).as("b_rows"),
        col("n_null").as("b_null"), col("n_distinct").as("b_distinct"),
        col("min_str").as("b_min_str"), col("max_str").as("b_max_str"),
        col("min_num").as("b_min_num"), col("max_num").as("b_max_num"))
    val a = profile(after, cols, approxDistinct)
      .select(col("column"),
        (col("n_nonnull") + col("n_null")).as("a_rows"),
        col("n_null").as("a_null"), col("n_distinct").as("a_distinct"),
        col("min_str").as("a_min_str"), col("max_str").as("a_max_str"),
        col("min_num").as("a_min_num"), col("max_num").as("a_max_num"))
    def ppm(n: Column, d: Column): Column =
      when(d > 0, floor(n.cast("double") * 1000000.0 / d.cast("double"))
        .cast("long")).otherwise(lit(0L))
    b.join(a, Seq("column"))
      .select(col("column"),
        col("b_rows"), col("a_rows"),
        (col("a_rows") - col("b_rows")).as("d_rows"),
        col("b_distinct"), col("a_distinct"),
        (col("a_distinct") - col("b_distinct")).as("d_distinct"),
        (ppm(col("a_null"), col("a_rows")) -
          ppm(col("b_null"), col("b_rows"))).as("d_null_ppm"),
        (coalesce(col("a_min_num") =!= col("b_min_num"), lit(false)) ||
         coalesce(col("a_max_num") =!= col("b_max_num"), lit(false)) ||
         coalesce(col("a_min_str") =!= col("b_min_str"), lit(false)) ||
         coalesce(col("a_max_str") =!= col("b_max_str"), lit(false)))
          .cast("long").as("range_moved"))
  }
}
