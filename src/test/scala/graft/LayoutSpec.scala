package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.ZOrder

/** Z-order layout: key exactness, round-trip losslessness, and the pruning
  * property the layout exists for — per-file min/max stats cut candidate
  * files on EVERY interleaved dimension, where a single-column sort prunes
  * only its own column. */
class LayoutSpec extends SparkSpec {

  /** 20k rows with two independent hash-uniform dims in [0, 1024) — a
    * deterministic stand-in for (group × time)-shaped corpora, so the
    * candidate-file counts below are stable across runs and boxes. */
  private lazy val corpus: DataFrame = spark.range(20000).toDF("id")
    .withColumn("x", pmod(xxhash64(col("id"), lit("zx")), lit(1024L)))
    .withColumn("y", pmod(xxhash64(col("id"), lit("zy")), lit(1024L)))

  test("morton key matches a bit-for-bit scala reference") {
    def mortonRef(bx: Long, by: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, b) =>
        acc | (((bx >> b) & 1L) << (2 * b)) | (((by >> b) & 1L) << (2 * b + 1))
      }
    val keyed = ZOrder.withZKey(corpus, Seq("x", "y"), bits = 8)
      .select("x", "y", "zkey").collect()
    assert(keyed.length == 20000)
    // Reference buckets from the observed ranges — the same two-value-per-
    // dim stats the engine's pass computes, re-derived independently here.
    val (mnx, mxx) = (keyed.map(_.getLong(0)).min, keyed.map(_.getLong(0)).max)
    val (mny, mxy) = (keyed.map(_.getLong(1)).min, keyed.map(_.getLong(1)).max)
    keyed.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val expect = mortonRef((x - mnx) * 256L / (mxx - mnx + 1),
                             (y - mny) * 256L / (mxy - mny + 1), 8)
      assert(z == expect, s"x=$x y=$y: z=$z expected=$expect")
    }
  }

  test("bucket edges: min->0, max->2^bits-1; null dim -> null key; overflow rejected") {
    val s = ZOrder.DimStats(-5L, 10L)
    val df = spark.range(1).select(
      ZOrder.bucket(lit(-5L), s, 4).as("lo"),
      ZOrder.bucket(lit(10L), s, 4).as("hi"),
      ZOrder.bucket(lit(null).cast("long"), s, 4).as("nl"))
    val r = df.head()
    assert(r.getLong(0) == 0L && r.getLong(1) == 15L && r.isNullAt(2))
    // Out-of-range values (stale/mismatched stats on the public surface)
    // degrade to the EDGE buckets instead of escaping [0, 2^bits) and
    // silently interleaving garbage (r19).
    val oob = spark.range(1).select(
      ZOrder.bucket(lit(-100L), s, 4).as("below"),
      ZOrder.bucket(lit(100L), s, 4).as("above")).head()
    assert(oob.getLong(0) == 0L && oob.getLong(1) == 15L, oob.toString)
    intercept[IllegalArgumentException] {
      ZOrder.bucket(lit(0L), ZOrder.DimStats(0L, Long.MaxValue - 1), 8)
    }
    // Full-span dimension (raw 64-bit hashes): the span itself overflows a
    // long — the BigInt-exact guard must still fire, not wrap and pass.
    intercept[IllegalArgumentException] {
      ZOrder.bucket(lit(0L), ZOrder.DimStats(Long.MinValue, Long.MaxValue), 1)
    }
    // Empty input / all-null dimension fails with the dimension's name.
    val emptyErr = intercept[IllegalArgumentException] {
      ZOrder.stats(corpus.where(lit(false)), Seq("x"))
    }
    assert(emptyErr.getMessage.contains("'x'"), emptyErr.getMessage)
    // A pre-existing output column is an error, not a silent replace.
    intercept[IllegalArgumentException] {
      ZOrder.withZKey(corpus.withColumn("zkey", lit(1L)), Seq("x", "y"), 8)
    }
  }

  test("zorderWrite is lossless and spends exactly one exchange") {
    val out = Files.createTempDirectory("graft_zorder_rt").toString + "/t"
    ZOrder.zorderWrite(corpus, Seq("x", "y"), bits = 8, path = out, nFiles = 8)
    val back = spark.read.parquet(out)
    val (a, b) = (agg3(corpus), agg3(back))
    assert(a == b, s"round-trip changed the row multiset: $a vs $b")
    // The layout job's plan: one RangePartitioning exchange, nothing else
    // (the stats pass is its own tiny job and the sort is within-partition).
    val plan = ZOrder.withZKey(corpus, Seq("x", "y"), 8, "__zkey")
      .repartitionByRange(8, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
  }

  private def agg3(df: DataFrame): Seq[Any] =
    df.agg(count(lit(1)), sum(col("id")), sum(col("x") * col("y"))).head().toSeq

  test("k-dim morton keys match the reference across random dims/bits/ranges (fuzz)") {
    // Generalized interleave reference: dim i's bit b at position b*k + i.
    def mortonRefK(bs: Seq[Long], bits: Int): Long =
      (for (i <- bs.indices; b <- 0 until bits)
        yield ((bs(i) >> b) & 1L) << (b * bs.size + i)).foldLeft(0L)(_ | _)
    val seed = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong)
      .getOrElse(FuzzRound.seed + 41)
    val rnd = new scala.util.Random(seed)
    for (trial <- 1 to 6) {
      val k = 2 + rnd.nextInt(3)                         // 2..4 dims
      val bits = 2 + rnd.nextInt(63 / k - 1)             // k*bits <= 63
      val mins = Seq.fill(k)(rnd.nextLong(2000000L) - 1000000L)
      val widths = Seq.fill(k)(1L + rnd.nextLong(100000L))
      val dims = (0 until k).map(i => s"d$i")
      var df = spark.range(500).toDF("id")
      for (i <- 0 until k)
        df = df.withColumn(dims(i),
          lit(mins(i)) + pmod(xxhash64(col("id"), lit(s"t$trial d$i")), lit(widths(i))))
      val rows = ZOrder.withZKey(df, dims, bits).collect()
      // Observed per-dim ranges, as the engine's stats pass sees them.
      val st = (0 until k).map { i =>
        val vs = rows.map(_.getLong(1 + i)); (vs.min, vs.max)
      }
      rows.foreach { r =>
        val bs = (0 until k).map { i =>
          val (mn, mx) = st(i)
          // BigInt sidesteps the test-side overflow the engine guards on.
          ((BigInt(r.getLong(1 + i)) - mn) * (BigInt(1) << bits) /
            (BigInt(mx) - mn + 1)).toLong
        }
        val expect = mortonRefK(bs, bits)
        assert(r.getAs[Long]("zkey") == expect,
          s"seed=$seed trial=$trial k=$k bits=$bits: ${r.mkString(",")} expected $expect")
      }
    }
  }

  test("z-order prunes candidate files on BOTH dims; single-col sort only on its own") {
    val base = Files.createTempDirectory("graft_zorder_prune").toString
    // Same corpus, same file count: layout A sorted by x alone, layout B
    // z-ordered on (x, y). 32 files of 625 rows each.
    corpus.repartitionByRange(32, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$base/byx")
    ZOrder.zorderWrite(corpus, Seq("x", "y"), bits = 8,
      path = s"$base/z", nFiles = 32)

    // Candidate files under min/max pruning for a predicate: files whose
    // [min, max] box intersects it — exactly what the parquet reader keeps
    // after footer-stats filtering.
    def stats(path: String): Seq[(Long, Long, Long, Long)] =
      spark.read.parquet(path)
        .groupBy(input_file_name()).agg(
          min("x").as("mnx"), max("x").as("mxx"),
          min("y").as("mny"), max("y").as("mxy"))
        .collect().toSeq
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val (byx, byz) = (stats(s"$base/byx"), stats(s"$base/z"))
    assert(byx.size == 32 && byz.size == 32, s"${byx.size} / ${byz.size} files")

    def candY(st: Seq[(Long, Long, Long, Long)], lo: Long, hi: Long): Int =
      st.count { case (_, _, mny, mxy) => mxy >= lo && mny <= hi }
    def candX(st: Seq[(Long, Long, Long, Long)], lo: Long, hi: Long): Int =
      st.count { case (mnx, mxx, _, _) => mxx >= lo && mnx <= hi }

    // A 10%-selective predicate on y (the dimension layout A ignores):
    // x-sorted files all span y's full range — zero pruning; the z layout
    // keeps a strict minority. Margins, not exact counts: range-partition
    // boundaries come from sampling.
    val (yl, yh) = (400L, 500L)
    assert(candY(byx, yl, yh) == 32, s"x-sorted pruned on y? ${candY(byx, yl, yh)}")
    assert(candY(byz, yl, yh) <= 16,
      s"z layout kept ${candY(byz, yl, yh)}/32 candidates for a 10% y-box")
    // And the z layout still prunes on x — the single-sort dim's strength
    // is traded down, not lost (x-sorted is perfect at ~4/32 here).
    val (xl, xh) = (0L, 100L)
    assert(candX(byz, xl, xh) <= 16,
      s"z layout kept ${candX(byz, xl, xh)}/32 candidates for a 10% x-box")
    assert(candX(byx, xl, xh) <= 6, s"x-sorted x-box: ${candX(byx, xl, xh)}")
  }
}
