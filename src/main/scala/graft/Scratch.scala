package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = ops.Tables.documents(spark, "/root/testdata/sf0.1")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    docs.count() // warm
    val sh = operators.Dedup.charShingles(docs, "doc_id", "text", 5)
    time("shingles")(sh.count())
    val sig = operators.Dedup.minHashSignature(sh, 8)
    time("signature")(sig.count())
    val bk = operators.Dedup.lshBuckets(sig, 8, 4)
    time("buckets")(bk.count())
    time("candidates")(operators.Dedup.lshCandidates(bk).count())
    spark.stop()
  }
}
