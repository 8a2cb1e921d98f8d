package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for all specs (one JVM, forked by sbt). */
object SparkSpec {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
}

abstract class SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.spark

  /** Build a DataFrame from rows of (columnName -> value) maps; missing keys → null.
    * Schema is given explicitly so nullable/typed columns behave like the
    * reference's pandas frames (NaN-able). */
  def frame(schema: StructType, rows: Seq[Map[String, Any]]): DataFrame = {
    val data = rows.map { m =>
      Row.fromSeq(schema.fields.map(f => m.get(f.name).orNull).toSeq)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 2), schema)
  }
}
