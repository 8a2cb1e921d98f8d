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
 * arrival-order-dependent); greedy streaming funnel final state vs a
 * single batch pass (TIME-ORDERED chunks — that variant's documented
 * in-order contract; its anchors re-minimize only within a batch); EXACT
 * streaming funnel (progressExact) under ARBITRARY chunk order with a
 * wide watermark (pure buffered disorder — nothing finalizes) AND under
 * time-banded chunks with a TIGHT watermark (finalization fires between
 * batches, no event late) — both against an independent driver-side fold,
 * each chunk flushed through its own micro-batch (processAllAvailable per
 * chunk) so batch boundaries are deterministic, not racy.
 */
class StreamFuzzSpec extends SparkSpec {

  private val N = sys.env.get("GRAFT_FUZZ_N").map(_.toInt).getOrElse(8)
  private val Seed = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(FuzzRound.seed)
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

  /** Like [[runStream]] but flushes each step through its own micro-batch
    * (processAllAvailable per step) — deterministic batch boundaries, and
    * the watermark advances BETWEEN steps, which is what exercises
    * cross-batch state plus watermark finalization. */
  private def runStreamSteps(df: DataFrame, sink: String, mode: String,
                             steps: Seq[() => Unit]): DataFrame = {
    spark.catalog.dropTempView(sink)
    val q = df.writeStream.format("memory").queryName(sink).outputMode(mode).start()
    try steps.foreach { s => s(); q.processAllAvailable() } finally q.stop()
    spark.table(sink)
  }

  /** Independent driver-side mirror of the funnel's chained-min fold
    * (anchors(s) = min ts matching step s strictly after anchors(s-1)) —
    * the semantics fr_funnel pins against DuckDB. Groups that never reach
    * step 1 are omitted, matching the stream's emit-on-change contract. */
  private def funnelOracle(rows: Seq[(Long, Long, String)],
                           steps: Seq[String => Boolean]): Map[Long, Int] =
    rows.groupBy(_._1).map { case (g, evs) =>
      val anch = Array.fill(steps.size)(Long.MaxValue)
      evs.map(e => (e._2, e._3)).sortBy(_._1).foreach { case (t, ty) =>
        for (s <- steps.indices)
          if (steps(s)(ty) &&
              (s == 0 || (anch(s - 1) != Long.MaxValue && t > anch(s - 1))) &&
              t < anch(s)) anch(s) = t
      }
      g -> anch.takeWhile(_ != Long.MaxValue).length
    }.filter(_._2 > 0)

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

  private val exactTypes = Seq("view", "click", "buy")
  private val exactStepCols = Seq(col("etype") === "view",
    col("etype") === "click", col("etype") === "buy")
  private val exactStepFns: Seq[String => Boolean] =
    exactTypes.map(t => (ty: String) => ty == t)

  private def exactStream(in: MemoryStream[(Long, Long, String)], delay: String) =
    graft.streaming.StreamingFunnel.progressExact(
      in.toDF().toDF("gid", "sec", "etype")
        .withColumn("ts", timestamp_seconds(col("sec"))),
      "gid", "sec", "ts", delay, exactStepCols,
      // sec is epoch seconds, event time its exact timestamp: non-late at
      // watermark W ms ⟺ sec*1000 >= W ⟺ sec >= ceil(W/1000).
      watermarkToTs = ms => Math.floorDiv(ms + 999, 1000)).toDF()

  private def maxSteps(sunk: DataFrame): Map[Long, Int] =
    sunk.groupBy(col("groupId")).agg(max(col("completedSteps")).as("steps"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test(s"$N exact-funnel ARBITRARY chunkings equal the driver fold") {
    import spark.implicits._
    val rnd = new Random(Seed + 4)
    (0 until N).foreach { i =>
      implicit val sqlCtx = spark.sqlContext
      val nGroups = 1 + rnd.nextInt(5)
      val rows = (0 until 150 + rnd.nextInt(100)).map(_ =>
        (rnd.nextInt(nGroups).toLong, epoch + rnd.nextInt(7200).toLong,
          exactTypes(rnd.nextInt(3))))
      val in = MemoryStream[(Long, Long, String)]
      // 90-day watermark: no event is ever late, nothing finalizes — the
      // buffer alone must reproduce the batch fold under ANY chunk order,
      // each chunk its own micro-batch.
      val got = maxSteps(runStreamSteps(exactStream(in, "90 days"),
        s"sfz_xfun_$i", "update",
        chunks(rows, rnd).map(c => () => { in.addData(c); () })))
      val want = funnelOracle(rows, exactStepFns)
      assert(got == want, s"case $i: stream $got vs oracle $want")
    }
  }

  test(s"$N exact-funnel banded chunkings with a tight watermark finalize exactly") {
    import spark.implicits._
    val rnd = new Random(Seed + 5)
    (0 until N).foreach { i =>
      implicit val sqlCtx = spark.sqlContext
      val nGroups = 1 + rnd.nextInt(5)
      val nBands = 4 + rnd.nextInt(4)
      val bandSec = 600
      // Band b covers [epoch + b*band, epoch + (b+1)*band); bands feed in
      // order (so the watermark advances and SEALS earlier bands between
      // micro-batches) but events WITHIN a band arrive in arbitrary order.
      // Delay < band width ⇒ finalization fires; later bands' events are
      // never behind the watermark ⇒ nothing is late. Each group's step
      // chain is deliberately SPREAD over strictly increasing bands (plus
      // same-type duplicates and never-matching noise), so by the time the
      // last step arrives its predecessors are already sealed — no single
      // batch's buffer ever holds a whole chain, and a seal-side fold bug
      // CANNOT hide behind max(completedSteps) over earlier provisional
      // emissions (the masking a dense generator allows).
      def bandTs(b: Int) = epoch + b * bandSec + rnd.nextInt(bandSec).toLong
      val deliberate = (0L until nGroups).flatMap { g =>
        // 3 distinct ascending bands for the chain, e.g. view@b0 click@b2
        // buy@b3; duplicates of each step in ITS band keep min-anchor logic
        // honest without enabling an intra-band chain.
        val Seq(bv, bc, bb) = rnd.shuffle((0 until nBands).toList).take(3).sorted.toSeq
        Seq(bv -> "view", bc -> "click", bb -> "buy").flatMap { case (b, t) =>
          (0 until 1 + rnd.nextInt(3)).map(_ => (g, bandTs(b), t))
        }
      }
      val noise = (0 until nBands).flatMap { b =>
        (0 until 10 + rnd.nextInt(20)).map(_ =>
          (rnd.nextInt(nGroups).toLong, bandTs(b), "noise"))
      }
      val all = deliberate ++ noise
      val bands = (0 until nBands).map { b =>
        rnd.shuffle(all.filter(e =>
          e._2 >= epoch + b * bandSec && e._2 < epoch + (b + 1) * bandSec))
      }.filter(_.nonEmpty)
      val delay = s"${60 + rnd.nextInt(bandSec - 60)} seconds"
      val in = MemoryStream[(Long, Long, String)]
      val got = maxSteps(runStreamSteps(exactStream(in, delay),
        s"sfz_bfun_$i", "update",
        bands.map(c => () => { in.addData(c); () })))
      val want = funnelOracle(all, exactStepFns)
      assert(got == want, s"case $i (bands=$nBands delay=$delay): " +
        s"stream $got vs oracle $want")
    }
  }

  test(s"$N heavy-hitter chunkings equal the batch window counts (exact regime)") {
    import spark.implicits._
    val rnd = new Random(Seed + 6)
    (0 until N).foreach { i =>
      implicit val sqlCtx = spark.sqlContext
      // Zipf-ish keys over random cardinality; capacity (64) above it, so
      // Space-Saving must degenerate to EXACT counting whatever the
      // micro-batch boundaries and however many hash buckets split the
      // window's key space (bucket summaries partition keys — their union
      // must be merge-free).
      val nKeys = 5 + rnd.nextInt(40)
      val winUs = 3600000000L
      val rows = (0 until 300 + rnd.nextInt(300)).map(_ =>
        (s"k${(math.pow(rnd.nextDouble(), 2.0) * nKeys).toInt}",
          epoch + rnd.nextInt(7200).toLong))
      val in = MemoryStream[(String, Long)]
      val hh = graft.streaming.StreamingTopK.heavyHitters(
        in.toDF().toDF("key0", "sec").withColumn("ts", timestamp_seconds(col("sec"))),
        "ts", "key0", "1 hour", "90 days", m = 64, buckets = 1 + rnd.nextInt(4))
      val sunk = runStreamSteps(hh.toDF(), s"sfz_topk_$i", "update",
        chunks(rows, rnd).map(c => () => { in.addData(c); () }))
      val got = sunk.groupBy(col("windowUs"), col("key"))
        .agg(max(col("count")).as("cnt"))
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      val want = rows.groupBy { case (k, sec) =>
        (sec * 1000000L / winUs * winUs, k)
      }.view.mapValues(_.size.toLong).toMap
      assert(got == want, s"case $i (keys=$nKeys): stream ${got.size} vs " +
        s"batch ${want.size} entries; diff ${(got.toSet diff want.toSet).take(5)}")
      // In the exact regime every emitted error term must be zero.
      assert(sunk.where(col("err") =!= 0L).isEmpty, s"case $i: nonzero err emitted")
    }
  }
}
