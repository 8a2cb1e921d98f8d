package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`: one entry per implemented operator (SURVEY.md §2 + the
  * training-data pipeline operators). `oracleSql`: equivalent DuckDB SQL over
  * the same parquet tables; keys without an oracle get a rows-only check.
  */
object SparkEntry {

  /** Flagship: 3-step funnel over the events table at sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    ops.FrQueries.queries("fr_funnel")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.FrQueries.queries ++ ops.PipelineQueries.queries ++
      ops.RelationalQueries.queries ++ ops.StreamingQueries.queries

  def oracleSql: Map[String, String] =
    ops.FrQueries.oracleSql ++ ops.PipelineQueries.oracleSql ++
      ops.RelationalQueries.oracleSql ++ ops.StreamingQueries.oracleSql
}
