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

  /** Per-key top-N without the single-reducer hot-key sort: the window form
    * (`row_number over (partition by key order by ...)`) serializes a hot
    * key's rows into ONE task — the same window-skew class as the plain
    * as-of join (see BENCH.md §SkewScale). Here phase 1 takes the top N
    * within (key, salt) — the hot key's sort spreads over `salts` tasks —
    * and phase 2 re-ranks the surviving ≤ N·salts candidates per key. The
    * result is EXACTLY the plain window's: a true top-N row outranks at
    * most N−1 rows globally, so it cannot be cut from its salt's local
    * top N whatever the salt assignment. The salt hashes `idCol`, keeping
    * the pipeline deterministic end-to-end (though the RESULT is
    * salt-independent given a total `ordering` — pass a unique column
    * last, the usual window-determinism contract).
    *
    * Shape at scale: two window exchanges, but the second sorts ≤ N·salts
    * rows per key. Use the plain window when keys are known-bounded; this
    * when any key can be a bot. */
  def topNPerKey(df: DataFrame, keyCol: String, idCol: String,
                 ordering: Seq[Column], n: Int, salts: Int = 64,
                 keepRank: Option[String] = None): DataFrame = {
    require(n > 0, "n must be positive")
    require(salts > 0, "salts must be positive")
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol), pmod(xxhash64(col(idCol)), lit(salts)))
      .orderBy(ordering: _*)
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(ordering: _*)
    val ranked = df.withColumn("__rk", row_number().over(w1))
      .where(col("__rk") <= n).drop("__rk")
      .withColumn("__rk", row_number().over(w2))
      .where(col("__rk") <= n)
    keepRank match {
      case Some(name) => ranked.withColumnRenamed("__rk", name)
      case None       => ranked.drop("__rk")
    }
  }

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
