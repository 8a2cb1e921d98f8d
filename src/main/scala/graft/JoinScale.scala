package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Scale probe for the temporal join operators (operators.AsOfJoin,
 * operators.RangeJoin), sibling of [[Throughput]]/[[ComponentsScale]]: the
 * sf0.1 battery runs them on 100k events — too small to see the shuffle
 * and sort costs that dominate at real size. This main synthesizes keyed
 * event streams with xxhash64-derived timestamps (deterministic, no
 * Date/Random) and reports wall time and matched-row counts per size.
 *
 * Pass criteria recorded in BENCH.md: as-of wall grows ~linearly with
 * rows (the plan is one Exchange + per-direction in-partition sorts — no
 * candidate blow-up), and range-join wall tracks the candidate count
 * (points + interval-replicas), never rows².
 *
 * Args: row counts for the left/point side (default 5M, 20M); the right/
 * interval side is the same size for as-of and 1/10th for range.
 */
object JoinScale {
  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(5000000L, 20000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", ScaleDefaults.shuffleParts(cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    sizes.foreach { n =>
      val nKeys = math.max(1L, n / 200) // ~200 events per key
      val span = 86400L * 1000000L     // one day of microseconds
      def stream(salt: Int, rows: Long, idName: String, tName: String) =
        spark.range(rows).select(
          pmod(xxhash64(col("id"), lit(salt)), lit(nKeys)).as("k"),
          pmod(xxhash64(col("id"), lit(salt + 7)), lit(span)).as(tName),
          col("id").as(idName))

      // --- as-of: n left rows pick up the latest prior right of n rows ---
      val left = stream(1, n, "lid", "lt")
      val right = stream(2, n, "rid", "rt")
      val (asofMatched, asofSec) = timed {
        operators.AsOfJoin
          .backward(left, right, Seq("k"), "lt", "rt", rightVals = Seq("rt"),
            tieBreak = Seq("rid"))
          .agg(count(col("asof_rt"))).collect()(0).getLong(0)
      }
      println(f"JOINSCALE asof rows=$n matched=$asofMatched wall=$asofSec%.1f " +
        f"rows_per_sec_per_core=${2 * n / asofSec / cpus}%.0f")

      // --- range: n points against n/10 one-hour windows, 1h buckets ---
      val hour = 3600L * 1000000L
      val points = stream(3, n, "pid", "p")
      val intervals = stream(4, n / 10, "iid", "lo")
        .withColumn("hi", col("lo") + hour)
      val (pairs, rangeSec) = timed {
        operators.RangeJoin
          .join(points, intervals, Seq("k"), "p", "lo", "hi", bucketWidth = hour)
          .count()
      }
      println(f"JOINSCALE range points=$n intervals=${n / 10} pairs=$pairs " +
        f"wall=$rangeSec%.1f")
    }
    spark.stop()
  }
}
