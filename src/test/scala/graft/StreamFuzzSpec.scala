package graft

import scala.util.Random

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/**
 * Stream-vs-batch differential fuzzer: the invariant under test is
 * BATCHING-INVARIANCE — a streaming operator fed the same rows through a
 * random number of micro-batches with random chunk boundaries must produce
 * exactly the batch result, because micro-batch boundaries are an
 * execution artifact, not a semantic one. This is the classic streaming
 * failure mode (state carried wrong across batches, per-batch logic that
 * assumed it saw everything) and no battery row exercises it: the file
 * source delivers one batch.
 *
 * Families: stream-stream interval join vs batch RangeJoin (same window
 * arithmetic on epoch seconds; rows dealt to chunks in ARBITRARY order —
 * the 90-day watermark means disorder may not drop anything); streaming
 * session_window vs its batch form (complete mode); streaming dedup vs
 * batch distinct (key set only — which duplicate survives is explicitly
 * arrival-order-dependent); streaming funnel final state vs a single
 * batch pass (TIME-ORDERED chunks — the operator's documented in-order
 * contract; its anchors re-minimize only within a batch).
 */
class StreamFuzzSpec extends SparkSpec {

  private val N = sys.env.get("GRAFT_FUZZ_N").map(_.toInt).getOrElse(8)
  private val Seed = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(20260813L)
  private val epoch = 1704067200L

  private def chunks[T](rows: Seq[T], rnd: Random): Seq[Seq[T]] = {
    val n = 1 + rnd.nextInt(4)
    val assign = rows.map(_ => rnd.nextInt(n))
    (0 until n).map(c => rows.zip(assign).collect { case (r, a) if a == c => r })
      .filter(_.nonEmpty)
  }

  private def runStream(df: DataFrame, sink: String, mode: String,
                        feed: () => Unit): DataFrame = {
    spark.catalog.dropTempView(sink)
    val q = df.writeStream.format("memory").queryName(sink).outputMode(mode).start()
    try { feed(); q.processAllAvailable() } finally q.stop()
    spark.table(sink)
  }

  test(s"$N interval-join chunkings equal the batch range join") {
    import spark.implicits._
    val rnd = new Random(Seed)
    (0 until N).foreach { i =>
      implicit val sqlCtx = spark.sqlContext
      val nGroups = 1 + rnd.nextInt(6)
      val span = Seq(3600, 86400)(rnd.nextInt(2))
      val windowSec = Seq(60, 600, 3600)(rnd.nextInt(3))
      val purch = (0 until 20 + rnd.nextInt(50)).map(j =>
        (rnd.nextInt(nGroups).toLong, (1000 + j).toLong, epoch + rnd.nextInt(span).toLong))
      val clk = (0 until 100 + rnd.nextInt(150)).map(j =>
        (rnd.nextInt(nGroups).toLong, (5000 + j).toLong, epoch + rnd.nextInt(span).toLong))

      val lin = MemoryStream[(Long, Long, Long)]
      val rin = MemoryStream[(Long, Long, Long)]
      val joined = graft.streaming.StreamIntervalJoin.join(
        lin.toDF().toDF("k", "p_id", "psec").withColumn("p_ts", timestamp_seconds(col("psec"))),
        rin.toDF().toDF("k", "c_id", "csec").withColumn("c_ts", timestamp_seconds(col("csec"))),
        Seq("k"), "p_ts", "c_ts", s"$windowSec seconds", "90 days")
      val got = runStream(joined, s"sfz_join_$i", "append", () => {
        chunks(purch, rnd).foreach(c => lin.addData(c))
        chunks(clk, rnd).foreach(c => rin.addData(c))
      }).select(col("p_id"), col("c_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      val points = clk.toDF("k", "c_id", "pt")
      val intervals = purch.toDF("k", "p_id", "lo").withColumn("hi", col("lo") + windowSec)
      val want = graft.operators.RangeJoin.join(points, intervals, Seq("k"),
        "pt", "lo", "hi", bucketWidth = 1 + rnd.nextInt(2 * windowSec))
        .select(col("p_id"), col("c_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want,
        s"case $i (groups=$nGroups span=$span window=$windowSec): " +
          s"stream ${got.size} vs batch ${want.size}; diff ${(got diff want) ++ (want diff got)}")
    }
  }

  test(s"$N session_window chunkings equal the batch session_window") {
    import spark.implicits._
    val rnd = new Random(Seed + 1)
    (0 until N).foreach { i =>
      implicit val sqlCtx = spark.sqlContext
      val nGroups = 1 + rnd.nextInt(5)
      val gapSec = Seq(30, 300, 3600)(rnd.nextInt(3))
      val rows = (0 until 150 + rnd.nextInt(100)).map(j =>
        (rnd.nextInt(nGroups).toLong, epoch + rnd.nextInt(43200).toLong))

      val in = MemoryStream[(Long, Long)]
      val sess = graft.streaming.StreamingSessions.sessionCounts(
        in.toDF().toDF("gid", "sec").withColumn("ts", timestamp_seconds(col("sec"))),
        "gid", "ts", s"$gapSec seconds", "90 days")
      val got = runStream(sess, s"sfz_sess_$i", "complete",
        () => chunks(rows, rnd).foreach(c => in.addData(c)))
        .collect().map(_.toString).sorted.toSeq

      val want = rows.toDF("gid", "sec")
        .withColumn("ts", timestamp_seconds(col("sec")))
        .groupBy(col("gid"), session_window(col("ts"), s"$gapSec seconds").as("session"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("gid"), col("session.start").as("session_start"),
          col("session.end").as("session_end"), col("n_events"))
        .collect().map(_.toString).sorted.toSeq
      assert(got == want, s"case $i (gap=$gapSec): stream ${got.size} vs batch ${want.size}")
    }
  }

  test(s"$N dedup chunkings keep exactly the batch-distinct key set") {
    import spark.implicits._
    val rnd = new Random(Seed + 2)
    (0 until N).foreach { i =>
      implicit val sqlCtx = spark.sqlContext
      // ~3x duplication so most batches carry cross-batch duplicates.
      val rows = (0 until 200).map(j =>
        (s"payload_${rnd.nextInt(70)}", epoch + rnd.nextInt(3600).toLong))
      val in = MemoryStream[(String, Long)]
      val first = graft.streaming.StreamingDedup.firstOccurrences(
        in.toDF().toDF("text", "sec").withColumn("ts", timestamp_seconds(col("sec"))),
        "ts", "text", "90 days")
      val got = runStream(first, s"sfz_dedup_$i", "append",
        () => chunks(rows, rnd).foreach(c => in.addData(c)))
        .select(col("text")).collect().map(_.getString(0)).toSeq
      assert(got.size == got.distinct.size, s"case $i: duplicate keys emitted")
      assert(got.toSet == rows.map(_._1).toSet, s"case $i: key set mismatch")
    }
  }

  test(s"$N funnel time-ordered chunkings equal the single-batch pass") {
    import spark.implicits._
    val rnd = new Random(Seed + 3)
    (0 until N).foreach { i =>
      implicit val sqlCtx = spark.sqlContext
      val nGroups = 1 + rnd.nextInt(5)
      val types = Seq("view", "click", "buy")
      val rows = (0 until 150 + rnd.nextInt(100)).map(j =>
        (rnd.nextInt(nGroups).toLong, epoch + rnd.nextInt(7200).toLong,
          types(rnd.nextInt(3)))).sortBy(_._2)
      val steps = Seq(col("etype") === "view", col("etype") === "click",
        col("etype") === "buy")
      def progressOf(df: DataFrame) =
        graft.streaming.StreamingFunnel.progress(df, "gid", "sec", steps)

      val in = MemoryStream[(Long, Long, String)]
      val stream = progressOf(in.toDF().toDF("gid", "sec", "etype")).toDF()
      // Time-ordered chunks: the operator's documented in-order contract
      // (anchors re-minimize only within a batch).
      val ordered = {
        val n = 1 + rnd.nextInt(4)
        val cuts = Seq.fill(n - 1)(rnd.nextInt(rows.size)).sorted :+ rows.size
        (0 +: cuts).zip(cuts).map { case (a, b) => rows.slice(a, b) }.filter(_.nonEmpty)
      }
      val got = runStream(stream, s"sfz_funnel_$i", "update",
        () => ordered.foreach(c => in.addData(c)))
        .groupBy(col("groupId")).agg(max(col("completedSteps")).as("steps"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

      val want = progressOf(rows.toDF("gid", "sec", "etype")).toDF()
        .groupBy(col("groupId")).agg(max(col("completedSteps")).as("steps"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == want, s"case $i: stream $got vs batch $want")
    }
  }
}
