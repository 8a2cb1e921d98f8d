package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic weighted sampling and token-budget sharding — the two
 * export-side primitives a training-data pipeline needs after cleaning and
 * dedup: draw a quality-weighted subset of the corpus, and write the
 * survivors as contiguous shards of a fixed token budget. Both are pure
 * functions of (id, salt) like every hash decision in this package
 * (TextAnalysis.saltedMd5 contract), so any engine — and any re-run —
 * reproduces the same sample and the same shard assignment bit-for-bit.
 * No reference counterpart (the reference has no sampling/export surface);
 * the weighted draw is Efraimidis–Spirakis (Inf. Proc. Letters 97(5),
 * 2006) reformulated to avoid cross-engine float transcendentals.
 */
object Sampling {

  /**
   * Weighted lottery ticket for integer weights: the max of `w` salted md5
   * draws, `max_{j<w} md5("<salt>:<id>:<j>")`.
   *
   * Why this form: Efraimidis–Spirakis samples by the key u^(1/w) (u
   * uniform), whose distribution equals the MAX of w independent uniforms
   * — so for integer weights the transcendental pow() can be replaced by
   * literally drawing w tickets and keeping the best. Tickets stay hex
   * STRINGS compared lexicographically (a 128-bit uniform), so the
   * cross-engine contract is pure string equality — no float in the
   * decision at all, where pow()'s last-ulp differences between libm
   * implementations could otherwise flip a rank at the cut boundary.
   *
   * Map-only and codegen'd (sequence → transform → array_max). Cost is
   * O(w) md5 calls per row — intended for small integer weights (quality
   * bands, source tiers; cap at ~32). Rows with weight < 1 hold zero
   * tickets (NULL) and can never be sampled.
   */
  def lotteryTicket(idCol: Column, weightCol: Column, salt: String): Column = {
    val w = weightCol.cast("long")
    // The documented ~32-ticket intent, enforced at 64: a caller passing a
    // raw score or token count as the weight would otherwise silently do
    // O(w) md5 calls per row (50k-element arrays for w = 50k). raise_error
    // fails the first offending row loudly instead.
    val bounded = when(w <= lit(64L), w - lit(1L))
      .otherwise(raise_error(concat(
        lit("lotteryTicket weight exceeds 64 (band the weights, or use " +
          "weightedKeepExpected for real-valued rates): "), w)).cast("long"))
    when(w >= 1,
      array_max(transform(
        sequence(lit(0L), bounded),
        j => md5(concat(lit(s"$salt:"), idCol.cast("string"), lit(":"),
          j.cast("string"))))))
  }

  /**
   * Deterministic weighted sample without replacement: the `k` rows with
   * the best [[lotteryTicket]], ties broken by id — P(row in sample) is
   * exactly the Efraimidis–Spirakis weighted-reservoir probability for
   * integer `weightCol`. Output carries the input columns plus `ticket`.
   *
   * Scale shape: the ticket is map-only; `orderBy(...).limit(k)` plans as
   * TakeOrderedAndProject — a per-partition top-k heap + a single k-row
   * merge, no global sort and no full shuffle at any corpus size. The
   * driver merge holds partitions×k rows, so for k beyond ~10⁶ pre-filter
   * with a ticket threshold from a quantile sketch and top-k the
   * survivors (same two-phase trick as Skew.saltedTopN); for the
   * rate-shaped variant with no exact k, filter on
   * TextAnalysis.hashUniform instead — no ordering at all.
   */
  /** Enforces the integer-weight contract the ticket scheme is built on:
    * a DOUBLE weight would silently truncate under the long cast — 2.7
    * draws 2 tickets, and a rates caller (all weights in (0,1)) gets an
    * EMPTY sample with no error. Real-valued rates belong to
    * [[weightedKeepExpected]]. */
  private def requireIntegralWeight(df: DataFrame, weightCol: String, op: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.schema(df.schema.fieldIndex(weightCol)).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"$op weight column '$weightCol' must be integral, is ${dt.simpleString} " +
        "— the lottery draws w whole tickets (fractions truncate silently, " +
        "weights < 1 never sample); use weightedKeepExpected for real-valued rates")
  }

  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, salt: String): DataFrame = {
    require(k > 0, "sample size must be positive")
    requireIntegralWeight(df, weightCol, "weightedSample")
    require(!df.columns.contains("ticket"),
      "input already has a 'ticket' column; rename it before sampling")
    df.withColumn("ticket", lotteryTicket(col(idCol), col(weightCol), salt))
      .where(col("ticket").isNotNull)
      .orderBy(col("ticket").desc, col(idCol))
      .limit(k)
  }

  /**
   * Expected-size weighted sample (Poisson sampling) — the form that
   * scales past [[weightedSample]]'s exact-k bound: each row is kept
   * independently with probability `min(1, k·w/W)` (W = total weight),
   * giving an expected sample size of ~k (exactly k when no rate
   * saturates) with CV ≈ 1/√k — at the corpus sizes where exact-k
   * matters least. Entirely map-only after ONE scalar aggregate for W:
   * no ordering, no top-k merge, no driver-size dependence on k — the
   * 100 TB path ("sample roughly a billion docs by quality"). The draw
   * is TextAnalysis.hashUniform, so the kept SET is a pure function of
   * (id, weight-column, salt): exactly re-runnable, engine-reproducible
   * (rate = one double multiply + divide of exact integer sums —
   * identical IEEE ops in any engine).
   */
  def weightedKeepExpected(df: DataFrame, idCol: String, weightCol: String,
                           k: Long, salt: String): DataFrame = {
    require(k > 0, "expected sample size must be positive")
    val totalRow = df.agg(sum(col(weightCol).cast("long")).as("w")).head()
    require(!totalRow.isNullAt(0) && totalRow.getLong(0) > 0,
      "total weight must be positive (empty input or all-null weights?)")
    val total = totalRow.getLong(0)
    df.where(TextAnalysis.hashUniform(col(idCol), salt) <
      lit(k.toDouble) * col(weightCol).cast("double") / lit(total.toDouble))
  }

  /**
   * Per-key weighted sample: keep the `n` best lottery tickets within each
   * `keyCol` — the quality-weighted form of TextAnalysis.capPerKey (which
   * is exactly this with all weights 1). The per-domain cap every mixture
   * pipeline runs, but biased toward high-weight (high-quality) documents
   * instead of uniformly. Same determinism contract: the kept set is a
   * pure function of (id, weight, salt). One window exchange partitioned
   * by key; for billion-row hot keys compose hashUniform with a
   * weight-stratified rate instead (capPerKeyApprox's regime).
   */
  def weightedSamplePerKey(df: DataFrame, keyCol: String, idCol: String,
                           weightCol: String, n: Int, salt: String): DataFrame = {
    require(n > 0, "cap must be positive")
    requireIntegralWeight(df, weightCol, "weightedSamplePerKey")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ticket").desc, col(idCol))
    df.withColumn("__ticket", lotteryTicket(col(idCol), col(weightCol), salt))
      .where(col("__ticket").isNotNull)
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= n)
      .drop("__rk", "__ticket")
  }

  /**
   * Token-budget sharding: place every row on the deterministic md5 line
   * (order by `md5("<salt>:<id>")`, id tie-break — content-random, so
   * every shard is an unbiased corpus slice), then cut the line into
   * contiguous shards of `budget` tokens: a row whose EXCLUSIVE running
   * token total is c lands in shard `c div budget`. Output:
   * (`idCol`, `n_tokens`, `shard`). A row never splits.
   *
   * Contract: shards are contiguous, non-overlapping RANGES of the token
   * prefix line — shard k covers [k·budget, …) of the running total, and
   * the cumulative tokens through shard k always reach (k+1)·budget (the
   * walkthrough spec pins this). A single shard's OWN token sum can dip
   * below budget when a large row straddles its lower boundary (the row
   * belongs to the earlier shard); do not size downstream work from a
   * per-shard minimum.
   *
   * This is the distributed prefix-sum shape, kept declarative:
   *  1. range-partition + sort by the md5 line (ONE exchange; each
   *     partition owns a contiguous slice of the line),
   *  2. per-partition token totals — P rows — to the driver, folded into
   *     exclusive partition offsets (bounded driver state, same class as
   *     k-means centroids / GK sketches elsewhere in this package),
   *  3. broadcast the P-row offset table back and window-cumsum WITHIN
   *     each partition slice, + offset = the global exclusive prefix.
   * The within-slice window re-clusters by partition id (narrow 4-column
   * exchange), so no task ever sees more than one slice and no global
   * single-partition window exists anywhere in the plan — the shape that
   * survives a 100 TB corpus, where a naive `Window.orderBy(line)` would
   * serialize everything through one task.
   *
   * The sorted frame is persisted (Caches.retain) so the offset job and
   * the output job see the SAME range boundaries — boundaries come from
   * sampling, and recomputation could legally re-draw them mid-query.
   * Shard assignment itself never depends on where the boundaries fall
   * (offsets absorb them); persistence only pins the two jobs together.
   */
  /**
   * Weight-proportional corpus interleaving (stride scheduling): assign
   * every row a sort key such that reading the corpus in `mix_key` order
   * delivers each key's rows at a rate proportional to its weight — every
   * training window sees the target source/language mix, not whatever
   * order the files happened to land in. Classic stride schedule: the
   * r-th row of key k (r = 1.., in salted-md5 order within the key, so
   * the within-key sequence is itself content-random) is released at
   * `mix_key = (r − 0.5) / w_k`. For any threshold T, key k has
   * contributed min(n_k, floor(T·w_k + ½)) rows — prefix proportions
   * track the weights within one row per key, the tightest deterministic
   * guarantee there is. Output: input columns + (`mix_rank`, `mix_key`);
   * consumers sort / range-partition by (`mix_key`, `keyCol`, `idCol`)
   * (the documented total-order tie-break — distinct keys can produce
   * equal strides, e.g. r=1,w=1 and r=2,w=3).
   *
   * Determinism: the within-key rank is a pure (id, salt) hash order, and
   * the stride is ONE IEEE division of exact integers — engine-identical.
   * `weightCol` must be a positive integral weight, constant within each
   * key (it scales the key's release rate).
   *
   * Scale shape: one window exchange partitioned by key (same class as
   * capPerKey — fine for source/language/domain keys with bounded
   * per-key volume; a billion-row hot key needs capPerKeyApprox-style
   * treatment first). Sorting by `mix_key` downstream is a range
   * partition, not a global single-task sort.
   */
  def interleaveOrder(df: DataFrame, keyCol: String, idCol: String,
                      weightCol: String, salt: String): DataFrame = {
    val clash = df.columns.toSet.intersect(Set("mix_rank", "mix_key"))
    require(clash.isEmpty,
      s"columns collide with interleaveOrder outputs: ${clash.mkString(", ")}")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(TextAnalysis.saltedMd5(col(idCol), salt), col(idCol))
    df.withColumn("mix_rank", row_number().over(w).cast("long"))
      .withColumn("mix_key",
        (col("mix_rank").cast("double") - lit(0.5)) / col(weightCol).cast("double"))
  }

  /**
   * Map-only approximate form of [[interleaveOrder]] for billion-row hot
   * keys (capPerKeyApprox's regime — a per-key `row_number` window would
   * sort every hot key's rows in one task group): the exact within-key
   * rank is replaced by `floor(u·n_k) + 1` on the salted md5 uniform,
   * where `n_k` comes from ONE count aggregate (null-safe joined back —
   * AQE broadcasts it while the key cardinality fits, exactly like
   * capPerKeyApprox). No window, no per-key sort anywhere: count + join +
   * map. Still a pure function of (id, salt, counts), so any engine — and
   * any re-run — produces the identical order.
   *
   * The trade: approximate ranks collide (two rows of a key can release
   * at the same stride time), so [[interleaveOrder]]'s within-ONE-row
   * prefix bound relaxes to binomial concentration — a prefix of P rows
   * holds P·w_k/W ± O(√P) of key k. For training-order purposes (windows
   * of thousands of rows) that noise is immaterial; use the exact form
   * when per-window guarantees matter and keys are bounded.
   */
  def interleaveOrderApprox(df: DataFrame, keyCol: String, idCol: String,
                            weightCol: String, salt: String): DataFrame = {
    val clash = df.columns.toSet
      .intersect(Set("mix_rank", "mix_key", "__key_k", "__key_n"))
    require(clash.isEmpty,
      s"columns collide with interleaveOrderApprox names: ${clash.mkString(", ")}")
    val counts = df.groupBy(col(keyCol).as("__key_k"))
      .agg(count(lit(1)).as("__key_n"))
    df.join(counts, col(keyCol) <=> col("__key_k"))
      .withColumn("mix_rank",
        (floor(TextAnalysis.hashUniform(col(idCol), salt) *
          col("__key_n").cast("double")) + lit(1L)).cast("long"))
      .withColumn("mix_key",
        (col("mix_rank").cast("double") - lit(0.5)) / col(weightCol).cast("double"))
      .drop("__key_k", "__key_n")
  }

  /**
   * Deterministic global training order for one epoch: every row's 0-based
   * position on the salted md5 line (`md5("<salt>:e<epoch>:<id>")`, id
   * tie-break) — the "shuffle the corpus between epochs" pass, as a pure
   * function of (id, salt, epoch): any engine, and any re-run, assigns the
   * same position to every row, and bumping `epoch` re-rolls the whole
   * permutation without touching the data. Output: (`idCol`, `pos`).
   *
   * Implemented AS [[shardByBudget]] with unit weights and budget 1 — the
   * exclusive prefix COUNT along the line is exactly the rank — so it
   * inherits the two-phase range-partition + P-row offset fold shape: no
   * global single-partition window anywhere in the plan, the property a
   * 100 TB corpus permutation needs (a naive row_number over one ordering
   * serializes the corpus through one task).
   */
  def globalOrder(df: DataFrame, idCol: String, salt: String,
                  epoch: Int): DataFrame =
    shardByBudget(df, idCol, lit(1L), budget = 1L, salt = s"$salt:e$epoch")
      .select(col(idCol), col("shard").as("pos"))

  def shardByBudget(df: DataFrame, idCol: String, tokensCol: Column,
                    budget: Long, salt: String): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val clash = df.columns.toSet.intersect(Set("__o", "__pid", "__off", "__cum", "n_tokens"))
    require(clash.isEmpty,
      s"columns collide with shardByBudget internal names: ${clash.mkString(", ")}")
    val spark = df.sparkSession
    val ordered = graft.util.Caches.retain(
      df.select(col(idCol), tokensCol.cast("long").as("n_tokens"))
        .withColumn("__o", TextAnalysis.saltedMd5(col(idCol), salt))
        .repartitionByRange(col("__o"), col(idCol))
        .withColumn("__pid", spark_partition_id()))
    val partTotals = ordered.groupBy(col("__pid"))
      .agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = partTotals.map { case (p, t) => val row = (p, acc); acc += t; row }
    val offDf = spark.createDataFrame(offsets.toIndexedSeq).toDF("__pid", "__off")
    val slice = Window.partitionBy(col("__pid")).orderBy(col("__o"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    ordered.join(broadcast(offDf), Seq("__pid"))
      .withColumn("__cum", coalesce(sum(col("n_tokens")).over(slice), lit(0L)) + col("__off"))
      .select(col(idCol), col("n_tokens"),
        expr(s"__cum div ${budget}L").as("shard"))
  }
}
