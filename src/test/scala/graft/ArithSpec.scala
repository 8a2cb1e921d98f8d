package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.util.Arith

/** Pins the exact-integer column arithmetic other operators' cross-engine
  * determinism rests on. */
class ArithSpec extends SparkSpec {

  test("floorDiv matches Math.floorDiv at any magnitude, including > 2^53") {
    val rnd = new scala.util.Random(11)
    val widths = Seq(1000L, 86400000000L, 3600L * 1000000000L)
    val values = Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, Long.MinValue + 1,
      1704067207179575175L, -1704067207179575175L,
      (1L << 53) + 1, -(1L << 53) - 1) ++
      Seq.fill(50)(rnd.nextLong())
    val schema = StructType(Seq(StructField("v", LongType)))
    val df = frame(schema, values.map(v => Map[String, Any]("v" -> v)))
    for (w <- widths) {
      val got = df.select(col("v"), Arith.floorDiv(col("v"), w).as("d"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      for (v <- values)
        assert(got(v) == Math.floorDiv(v, w),
          s"floorDiv($v, $w): got ${got(v)}, want ${Math.floorDiv(v, w)}")
    }
  }

  test("dayOfTsNanos agrees with java.time epoch-day arithmetic") {
    val nanos = Seq(
      0L,                      // epoch
      1704067200000000000L,    // 2024-01-01 00:00 UTC exactly
      1704067199999999999L,    // 1ns before midnight
      1704067207179575175L,    // mid-day
      86399999999999L,         // 1970-01-01 23:59:59.999…
      86400000000000L)         // 1970-01-02 00:00
    val schema = StructType(Seq(StructField("ts", LongType)))
    val df = frame(schema, nanos.map(v => Map[String, Any]("ts" -> v)))
    val got = df.select(col("ts"),
        graft.sources.GroupedWriter.dayOfTsNanos(col("ts")).as("dt"))
      .collect().map(r => r.getLong(0) -> r.getDate(1).toLocalDate).toMap
    for (n <- nanos) {
      val want = java.time.LocalDate.ofEpochDay(Math.floorDiv(n, 86400000000000L))
      assert(got(n) == want, s"dayOfTsNanos($n): got ${got(n)}, want $want")
    }
  }
}
