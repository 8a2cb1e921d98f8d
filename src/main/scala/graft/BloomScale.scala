package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Scale probe for the Bloom-routed blocklist scrub
 * (TextAnalysis.blocklistFilter) vs the plain left-anti join it is
 * semantically equal to. The battery runs it on 5k docs where AQE simply
 * broadcasts the blocklist; the operator exists for the regime where the
 * blocklist CANNOT broadcast (multi-GB hash lists), so the probe disables
 * auto-broadcast to put both plans in that regime and measures wall +
 * shuffle bytes at two corpus sizes. Expected shape: the plain anti-join
 * shuffles the ENTIRE corpus by key; the bloom route shuffles only the
 * maybe-rows (true hits + fpp·corpus), so its shuffle volume is ~constant
 * in corpus size at fixed hit count while the plain join's grows linearly.
 * Both paths must return identical kept counts (the routing is semantics-
 * free — that is the operator's contract, oracle-pinned in the battery).
 */
object BloomScale {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toLong) else Seq(2000000L, 10000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", ScaleDefaults.shuffleParts(cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // The regime the operator exists for: blocklist too big to broadcast.
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    sizes.foreach { n =>
      // Corpus keys k<id>; every 200th doc is blocked (n/200 true hits);
      // the blocklist also carries n/200 keys absent from the corpus.
      val corpus = graft.util.Caches.retain(spark.range(n)
        .select(col("id").as("doc_id"), concat(lit("k"), col("id")).as("k")))
      val block = graft.util.Caches.retain(
        spark.range(n / 200).select(concat(lit("k"), col("id") * 200).as("bk"))
          .unionByName(spark.range(n / 200)
            .select(concat(lit("x"), col("id")).as("bk"))))
      corpus.count(); block.count() // materialize inputs outside the timings

      val (plainKept, plainStats) = graft.result.JobStats.measure(spark) {
        corpus.join(block, col("k") === col("bk"), "left_anti").count()
      }
      val (bloomKept, bloomStats) = graft.result.JobStats.measure(spark) {
        operators.TextAnalysis.blocklistFilter(corpus, "k", block, "bk",
          expectedItems = n / 100, fpp = 0.01).count()
      }
      require(plainKept == bloomKept,
        s"routing changed semantics: $plainKept vs $bloomKept")
      graft.util.Caches.drain()
      println(f"BLOOMSCALE n=$n blocked=${n - plainKept} kept=$plainKept " +
        f"plain_wall=${plainStats.wallTimeMs / 1000.0}%.1f " +
        f"plain_shuffle_mb=${plainStats.shuffleBytesWritten / 1e6}%.1f " +
        f"bloom_wall=${bloomStats.wallTimeMs / 1000.0}%.1f " +
        f"bloom_shuffle_mb=${bloomStats.shuffleBytesWritten / 1e6}%.1f")
    }
    spark.stop()
  }
}
