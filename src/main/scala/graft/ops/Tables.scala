package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Test-table access for the driver contract ([[graft.SparkEntry]]).
 *
 * The `events` table stores its timestamp as parquet TIMESTAMP(NANOS), which
 * Spark only reads via the nanos-as-long legacy flag — giving us exactly the
 * reference's "timestamp is an opaque number at any scale" model
 * (frocket/common/validation/query_validator.py:268-299): the column arrives
 * as epoch-nanos LongType and every comparison/min/max works unchanged.
 * DuckDB-side oracles mirror it with `epoch_ns(ts)`.
 */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Runtime-settable SQLConf; harmless for non-nanos tables.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def events(spark: SparkSession, sfDir: String): DataFrame    = load(spark, sfDir, "events")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
