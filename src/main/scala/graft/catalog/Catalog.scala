package graft.catalog

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Dataset registration — the Spark-native replacement for the reference's
 * registration job (frocket/invoker/jobs/registration_job.py +
 * worker/runners/registration_task_runner.py).
 *
 * The reference samples files, infers per-file Pandas schemas, merges them,
 * and validates a physical invariant (each group's rows in exactly one
 * file). Here a single Spark job does the honest version of all of it:
 * schema comes from the parquet footer (no sampling risk), column
 * classification mirrors the reference's 4-type system
 * (frocket/common/dataset.py:102-107), unsupported types are recorded
 * rather than rejected wholesale (dataset.py:153-159), and the stats pass
 * (min/max timestamp, group count) is one distributed aggregate. The
 * one-group-one-file invariant is NOT required — Spark shuffles — so
 * registration validates only what still matters: group id non-null and of
 * int/string type, timestamp numeric and non-null
 * (registration_task_runner.py:79-101).
 */
object Catalog {

  /** Mirror of the reference's DatasetColumnType (dataset.py:102-107). */
  sealed trait ColType
  object ColType {
    case object Int    extends ColType
    case object Float  extends ColType
    case object Bool   extends ColType
    case object Str    extends ColType
  }

  /** Per-column registration attributes, mirroring the reference's
    * DatasetColumnAttributes (frocket/common/dataset.py:110-131): numeric
    * min/max for numeric columns; for string columns the unique-values
    * ratio, categorical designation (ratio <= `categoricalRatio`) and the
    * top-N values with their normalized share (>= `categoricalTopMinPct`,
    * descending share — config keys dataset.categorical.* in the
    * reference's config.py:46-49). */
  final case class ColumnAttrs(
      numericMin: Option[Double] = None,
      numericMax: Option[Double] = None,
      categorical: Boolean = false,
      catUniqueRatio: Option[Double] = None,
      catTopValues: Seq[(String, Double)] = Nil)

  final case class RegisteredDataset(
      name: String,
      basepath: String,
      groupIdColumn: String,
      timestampColumn: String,
      columns: Map[String, ColType],
      unsupportedColumns: Seq[String],
      minTimestamp: Double,
      maxTimestamp: Double,
      numGroups: Long,
      numRows: Long,
      registeredAt: Long,
      columnAttrs: Map[String, ColumnAttrs] = Map.empty,
      dtypeNames: Map[String, String] = Map.empty)

  final case class RegistrationException(msg: String) extends RuntimeException(msg)

  private val datasets = new ConcurrentHashMap[String, RegisteredDataset]()

  /** Classify a Spark type into the reference's 4-type system; None =
    * unsupported (datetimes, nested... recorded, not fatal). Decimals are
    * Float, matching SchemaValidator.colKind — registration and query-time
    * validation must agree on the supported column set. */
  def classify(dt: DataType): Option[ColType] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some(ColType.Int)
    case FloatType | DoubleType | _: DecimalType       => Some(ColType.Float)
    case BooleanType                                   => Some(ColType.Bool)
    case StringType                                    => Some(ColType.Str)
    case _                                             => None
  }

  def register(spark: SparkSession, name: String, basepath: String,
               groupIdColumn: String, timestampColumn: String,
               categoricalRatio: Double = 0.1,
               categoricalTopCount: Int = 20,
               categoricalTopMinPct: Double = 0.01): RegisteredDataset = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(basepath)
    val schema = df.schema

    def field(c: String): StructField =
      schema.find(_.name == c).getOrElse(
        throw RegistrationException(s"Column '$c' not found in $basepath"))

    // Group id: int or string, no nulls (registration_task_runner.py:85-92).
    classify(field(groupIdColumn).dataType) match {
      case Some(ColType.Int) | Some(ColType.Str) => ()
      case other => throw RegistrationException(
        s"Group id column '$groupIdColumn' must be int or string, got $other")
    }
    // Timestamp: numeric, scale-agnostic (registration_task_runner.py:94-101).
    classify(field(timestampColumn).dataType) match {
      case Some(ColType.Int) | Some(ColType.Float) => ()
      case other => throw RegistrationException(
        s"Timestamp column '$timestampColumn' must be numeric, got $other")
    }

    val classified = schema.fields.map(f => f.name -> classify(f.dataType))
    val columns = classified.collect { case (n, Some(t)) => n -> t }.toMap
    val unsupported = classified.collect { case (n, None) => n }.toSeq

    // One distributed pass for stats + null validation + per-column
    // attributes: numeric min/max and, for string columns, the approximate
    // distinct count for the unique-values ratio (HyperLogLog++ partials
    // merge map-side — exact count_distinct per column would add one
    // expand+shuffle each, which doesn't survive a wide schema at 100 TB;
    // the reference itself reads only a sample, so approx on FULL data is
    // strictly more faithful).
    val numericCols = columns.collect {
      case (n, t) if (t == ColType.Int || t == ColType.Float) && n != timestampColumn => n
    }.toSeq.sorted
    val stringCols = columns.collect { case (n, ColType.Str) => n }.toSeq.sorted
    val baseAggs = Seq(
      min(col(timestampColumn).cast("double")).as("min_ts"),
      max(col(timestampColumn).cast("double")).as("max_ts"),
      count_distinct(col(groupIdColumn)).as("n_groups"),
      count(lit(1)).as("n_rows"),
      sum(when(col(groupIdColumn).isNull, 1L).otherwise(0L)).as("null_gids"),
      sum(when(col(timestampColumn).isNull ||
               col(timestampColumn).cast("double").isNaN, 1L).otherwise(0L)).as("bad_ts"))
    val colAggs =
      numericCols.flatMap(n => Seq(
        min(col(n).cast("double")).as(s"__min_$n"),
        max(col(n).cast("double")).as(s"__max_$n"))) ++
      stringCols.map(n => approx_count_distinct(col(n)).as(s"__acd_$n"))
    val allAggs = baseAggs ++ colAggs
    val stats = df.agg(allAggs.head, allAggs.tail: _*).collect()(0)
    if (stats.getAs[Long]("null_gids") > 0)
      throw RegistrationException(s"Group id column '$groupIdColumn' contains nulls")
    if (stats.getAs[Long]("bad_ts") > 0)
      throw RegistrationException(s"Timestamp column '$timestampColumn' contains nulls/NaNs")
    val nRows = stats.getAs[Long]("n_rows")

    val numericAttrs = numericCols.map { n =>
      n -> ColumnAttrs(
        numericMin = Option(stats.getAs[Double](s"__min_$n")),
        numericMax = Option(stats.getAs[Double](s"__max_$n")))
    }
    // String columns: categorical iff unique-ratio <= categoricalRatio
    // (registration_task_runner.py:176-203); top values as normalized
    // shares, one small top-K job per categorical column (registration-time
    // only — TakeOrderedAndProject after partial aggregation, no full sort).
    val stringAttrs = stringCols.map { n =>
      val ratio =
        if (nRows == 0) 1.0
        else stats.getAs[Long](s"__acd_$n").toDouble / nRows
      if (ratio <= categoricalRatio) {
        val top =
          if (categoricalTopCount == 0) Nil
          else df.groupBy(col(n)).agg(count(lit(1)).as("__c"))
            .where(col(n).isNotNull)
            .orderBy(desc("__c"), asc(n))
            .limit(categoricalTopCount)
            .collect()
            .map(r => r.getString(0) -> r.getLong(1).toDouble / nRows)
            .filter(_._2 >= categoricalTopMinPct)
            .toSeq
        n -> ColumnAttrs(categorical = true, catUniqueRatio = Some(ratio),
          catTopValues = top)
      } else n -> ColumnAttrs(categorical = false, catUniqueRatio = Some(ratio))
    }

    val ds = RegisteredDataset(name, basepath, groupIdColumn, timestampColumn,
      columns, unsupported,
      stats.getAs[Double]("min_ts"), stats.getAs[Double]("max_ts"),
      stats.getAs[Long]("n_groups"), nRows,
      System.currentTimeMillis(),
      columnAttrs = (numericAttrs ++ stringAttrs).toMap,
      dtypeNames = schema.fields.map(f => f.name -> f.dataType.simpleString).toMap)
    datasets.put(name, ds)
    ds
  }

  private val lastUsedAt = new ConcurrentHashMap[String, java.lang.Long]()

  def get(name: String): Option[RegisteredDataset] = Option(datasets.get(name))

  /** Remove a dataset; returns whether it was registered. */
  def unregister(name: String): Boolean = {
    lastUsedAt.remove(name)
    datasets.remove(name) != null
  }

  /** Epoch-millis of the dataset's last query, if any (reference
    * datastore.last_used — feeds the unregister safety interval). */
  def lastUsed(name: String): Option[Long] =
    Option(lastUsedAt.get(name)).map(_.longValue)

  def list(): Seq[RegisteredDataset] =
    { import scala.jdk.CollectionConverters._; datasets.values.asScala.toSeq }

  /** Load a registered dataset as a DataFrame (marks it used). */
  def load(spark: SparkSession, name: String): DataFrame = {
    val ds = get(name).getOrElse(throw RegistrationException(s"Unknown dataset '$name'"))
    lastUsedAt.put(name, System.currentTimeMillis())
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(ds.basepath)
  }
}
