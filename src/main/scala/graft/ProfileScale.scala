package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Scale probe for the one-pass profiler (operators.Profile): measures the
 * documented distinct-counting trade — exact mode's multi-distinct Expand
 * replicates the scan once per profiled column before the partial
 * aggregate (data × cols intermediate volume), while `approxDistinct`
 * keeps ONE pass with fixed-size HLL++ state per column. The probe
 * reports both walls and the Expand's shuffle cost at growing row counts,
 * plus the HLL error actually observed at rsd 2% — the numbers behind
 * "approx is the 100 TB default, exact is the audit mode".
 */
object ProfileScale {
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
    val cols = Seq("a", "b", "c", "d", "e", "f")

    def corpusAt(n: Long) = graft.util.Caches.retain(spark.range(n).select(
      col("id").as("a"),                                   // unique
      (col("id") % 97).as("b"),                            // tiny card.
      (col("id") % 1000003).as("c"),                       // ~1M card.
      concat(lit("u"), col("id") % 50000).as("d"),         // 50k strings
      (col("id") * 1.5).as("e"),                           // unique doubles
      when(col("id") % 10 === 0, lit(null).cast("string")) // 10% null
        .otherwise(concat(lit("x"), col("id") % 7)).as("f")))

    // Warmup (codegen + HLL paths).
    { val w = corpusAt(200000L)
      graft.operators.Profile.profile(w, cols).collect()
      graft.operators.Profile.profile(w, cols, approxDistinct = true, rsd = 0.02).collect()
      graft.util.Caches.drain() }

    sizes.foreach { n =>
      val corpus = corpusAt(n)
      corpus.count()
      import graft.result.JobStats.minOf2
      val (exactRows, ex) = minOf2(graft.result.JobStats.measure(spark) {
        graft.operators.Profile.profile(corpus, cols).collect()
      })
      val (approxRows, ap) = minOf2(graft.result.JobStats.measure(spark) {
        graft.operators.Profile.profile(corpus, cols,
          approxDistinct = true, rsd = 0.02).collect()
      })
      val exact = exactRows.map(r => r.getString(0) -> r.getLong(3)).toMap
      val approx = approxRows.map(r => r.getString(0) -> r.getLong(3)).toMap
      val worstErr = cols.map { c =>
        if (exact(c) == 0L) 0.0
        else math.abs(approx(c) - exact(c)).toDouble / exact(c)
      }.max
      graft.util.Caches.drain()
      println(f"PROFILESCALE n=$n exact_wall=${ex.wallTimeMs / 1000.0}%.1f " +
        f"exact_shuffle_mb=${ex.shuffleBytesWritten / 1e6}%.1f " +
        f"approx_wall=${ap.wallTimeMs / 1000.0}%.1f " +
        f"approx_shuffle_mb=${ap.shuffleBytesWritten / 1e6}%.1f " +
        f"worst_hll_rel_err=${worstErr}%.4f")
    }
    spark.stop()
  }
}
