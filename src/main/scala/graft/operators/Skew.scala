package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation utilities for hot keys at scale. AQE's skew-join splitting
 * (spark.sql.adaptive.skewJoin, on by default) covers joins; these cover the
 * aggregation side, where one giant group (a bot user, an empty-string key)
 * would otherwise pin a single reducer while 999 executors idle.
 *
 * Pattern: two-phase aggregation through a random salt. Phase 1 aggregates
 * (key, salt) — the hot key's rows spread over `salts` reducers; phase 2
 * merges the per-salt partials. Works for any algebraic aggregate
 * (sum/count/min/max); for count-distinct use the exact two-level
 * (key, value) pre-group or approx_count_distinct.
 */
object Skew {

  /** Salted sum/count groupBy: equivalent to
    * `df.groupBy(key).agg(sum(valueCol) as "sum", count as "count")` but with
    * the single-reducer hot-key bottleneck spread over `salts` partitions. */
  def saltedSumCount(df: DataFrame, keyCol: String, valueCol: String,
                     salts: Int = 16): DataFrame = {
    val phase1 = df
      .withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(col(valueCol)).as("__s"), count(lit(1)).as("__c"))
    phase1.groupBy(col(keyCol))
      .agg(sum(col("__s")).as("sum"), sum(col("__c")).as("count"))
  }

  /** Exact distinct count per key without a skewed exchange: pre-group on
    * (key, value) — the hot key's distinct values spread across reducers —
    * then count rows per key. */
  def skewSafeCountDistinct(df: DataFrame, keyCol: String, valueCol: String): DataFrame =
    df.select(col(keyCol), col(valueCol)).distinct()
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n_distinct"))

  /** Broadcast-salted join for a skewed fact⋈dim join when AQE is
    * unavailable: replicate each dim row `salts` times with a salt column,
    * salt the fact side randomly-but-deterministically, join on (key, salt).
    * Spreads a hot join key over `salts` tasks. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keyCol: String,
                 salts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(col(keyCol), spark_partition_id(), monotonically_increasing_id()), lit(salts)))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(broadcast(explodedDim), Seq(keyCol, "__salt")).drop("__salt")
  }
}
