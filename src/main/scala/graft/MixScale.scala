package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Scale probe for corpus interleaving (Sampling.interleaveOrder vs
 * interleaveOrderApprox) under the regime the approx form exists for: a
 * HOT key holding most of the corpus. The exact form's per-key
 * `row_number` window funnels every hot-key row through one task's sort;
 * the approx form replaces the rank with `floor(u·n_k)+1` from one count
 * aggregate — count + broadcast join + map, nothing key-serial. The probe
 * measures both at growing sizes with 90% of rows on one key, and
 * reports the approx form's mix quality (max prefix deviation from the
 * weight share over 1%-granularity prefixes) so the documented
 * binomial-concentration trade is a number, not an adjective.
 */
object MixScale {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toLong) else Seq(2000000L, 10000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", ScaleDefaults.shuffleParts(cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.result.JobStats.minOf2

    // Warmup both plans at 200k.
    def corpusAt(n: Long): org.apache.spark.sql.DataFrame = graft.util.Caches.retain(spark.range(n).select(
      col("id"),
      // 90% hot key, 10 cold keys with 1% each; hot gets weight 4.
      when(pmod(col("id"), lit(100)) < 90, lit("hot"))
        .otherwise(concat(lit("k"), pmod(col("id"), lit(10)))).as("src"))
      .withColumn("w", when(col("src") === "hot", lit(4L)).otherwise(lit(1L))))
    locally { val w = corpusAt(200000L)
      operators.Sampling.interleaveOrder(w, "src", "id", "w", "mx")
        .agg(sum(col("mix_rank"))).head()
      operators.Sampling.interleaveOrderApprox(w, "src", "id", "w", "mx")
        .agg(sum(col("mix_rank"))).head()
      graft.util.Caches.drain() }

    sizes.foreach { n =>
      val corpus = corpusAt(n)
      corpus.count()
      val (exactSum, ex) = minOf2(graft.result.JobStats.measure(spark) {
        operators.Sampling.interleaveOrder(corpus, "src", "id", "w", "mx")
          .agg(sum(col("mix_rank"))).head().getLong(0)
      })
      val (approxSum, ap) = minOf2(graft.result.JobStats.measure(spark) {
        operators.Sampling.interleaveOrderApprox(corpus, "src", "id", "w", "mx")
          .agg(sum(col("mix_rank"))).head().getLong(0)
      })
      // Mix quality of the approx order: a stride schedule releases rows
      // at rate w PER KEY, so while every key is active the hot share is
      // 4/(4 + 10·1) = 2/7; the cold keys (1% of rows each, rate 1)
      // exhaust after the first ~14% of the output line, after which the
      // stream is rightly pure hot. Measure the max deviation from 2/7
      // over the 1%-granularity prefixes INSIDE the mixed region
      // (percentiles 1..12 — the binomial-concentration claim made
      // concrete). The ntile pass is probe-side analysis, not the
      // operator's plan.
      val hotShare = operators.Sampling
        .interleaveOrderApprox(corpus, "src", "id", "w", "mx")
        .select(col("src"), col("mix_key"))
        .withColumn("pct", ntile(100).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("mix_key"))))
        .where(col("pct") <= 12)
        .groupBy(col("pct"))
        .agg((sum(when(col("src") === "hot", 1L).otherwise(0L)).cast("double") /
          count(lit(1))).as("share"))
        .agg(max(abs(col("share") - lit(2.0 / 7.0)))).head().getDouble(0)
      graft.util.Caches.drain()
      println(f"MIXSCALE n=$n exact_wall=${ex.wallTimeMs / 1000.0}%.1f " +
        f"approx_wall=${ap.wallTimeMs / 1000.0}%.1f " +
        f"exact_ranksum=$exactSum approx_ranksum=$approxSum " +
        f"approx_max_prefix_dev=${hotShare}%.4f")
    }
    spark.stop()
  }
}
