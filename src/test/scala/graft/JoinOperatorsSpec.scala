package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{AsOfJoin, RangeJoin}

/** Semantics + plan-shape coverage for the as-of and range join operators. */
class JoinOperatorsSpec extends SparkSpec {

  private val lSchema = StructType(Seq(
    StructField("k", LongType), StructField("lt", LongType), StructField("lid", LongType)))
  private val rSchema = StructType(Seq(
    StructField("k", LongType), StructField("rt", LongType), StructField("rid", LongType)))

  private def lf(rows: (Long, Long, Long)*) =
    frame(lSchema, rows.map { case (k, t, i) => Map[String, Any]("k" -> k, "lt" -> t, "lid" -> i) })
  private def rf(rows: (Long, Long, Long)*) =
    frame(rSchema, rows.map { case (k, t, i) => Map[String, Any]("k" -> k, "rt" -> t, "rid" -> i) })

  private def asofMap(left: org.apache.spark.sql.DataFrame) =
    left.collect().map(r => r.getLong(2) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap

  test("asof backward: latest prior-or-equal right; unmatched left is null") {
    val left = lf((1L, 10L, 100L), (1L, 25L, 101L), (2L, 5L, 102L))
    val right = rf((1L, 10L, 200L), (1L, 20L, 201L), (2L, 50L, 202L))
    val got = asofMap(AsOfJoin.backward(left, right, Seq("k"), "lt", "rt",
      rightVals = Seq("rid"), tieBreak = Seq("rid")))
    // lid 100 at t=10: equal-time right 200 matches (non-strict).
    // lid 101 at t=25: latest prior is 201 (t=20). lid 102 at t=5: nothing.
    assert(got == Map(100L -> Some(200L), 101L -> Some(201L), 102L -> None))
  }

  test("asof strict: equal-time right is not eligible") {
    val left = lf((1L, 10L, 100L), (1L, 11L, 101L))
    val right = rf((1L, 10L, 200L))
    val got = asofMap(AsOfJoin.backward(left, right, Seq("k"), "lt", "rt",
      rightVals = Seq("rid"), strict = true, tieBreak = Seq("rid")))
    assert(got == Map(100L -> None, 101L -> Some(200L)))
  }

  test("asof tie-break: among rights at identical time the last by tieBreak wins") {
    val left = lf((1L, 20L, 100L))
    val right = rf((1L, 10L, 203L), (1L, 10L, 207L), (1L, 10L, 205L))
    val got = asofMap(AsOfJoin.backward(left, right, Seq("k"), "lt", "rt",
      rightVals = Seq("rid"), tieBreak = Seq("rid")))
    assert(got == Map(100L -> Some(207L)))
  }

  test("asof plan is one window pass — no join operator, ONE shuffle") {
    val plan = AsOfJoin.backward(lf((1L, 10L, 100L)), rf((1L, 5L, 200L)),
      Seq("k"), "lt", "rt", rightVals = Seq("rid"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of join must compile to a window pass, got:\n$plan")
    assert(plan.contains("Window"))
    // exactly one Exchange: the key shuffle feeding the window(s) — a
    // second one would mean the union sides or directions shuffle separately
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"as-of join must shuffle exactly once, got:\n$plan")
    // nearest adds the second direction but must still shuffle once
    val planN = AsOfJoin.nearest(lf((1L, 10L, 100L)), rf((1L, 5L, 200L)),
      Seq("k"), "lt", "rt", rightVals = Seq("rid"))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(planN).size == 1,
      s"nearest as-of must still shuffle exactly once, got:\n$planN")
  }

  test("asof agrees with a brute-force reference on random data (all directions/modes)") {
    // Small key space + coarse timestamps force heavy equal-time collisions —
    // the regime where the side-ordering and tie-break rules actually bite.
    // timeBucket widths: None = plain path; 1 = every timestamp its own
    // bucket (carry does ALL the work); 7 = buckets cut mid-range (both the
    // in-bucket and carry paths contribute); 1000 = one bucket (carry never
    // fires). All must agree exactly.
    for (seed <- 1 to 5; strict <- Seq(false, true);
         bucket <- Seq(None, Some(1L), Some(7L), Some(1000L))) {
      val rnd = new scala.util.Random(seed)
      val ls = Seq.tabulate(120)(i => (rnd.nextInt(5).toLong, rnd.nextInt(20).toLong, 1000L + i))
      val rs = Seq.tabulate(120)(i => (rnd.nextInt(5).toLong, rnd.nextInt(20).toLong, 2000L + i))
      def back(k: Long, lt: Long): Option[(Long, Long)] = {
        val e = rs.filter { case (rk, rt, _) => rk == k && (if (strict) rt < lt else rt <= lt) }
        if (e.isEmpty) None else { val m = e.maxBy { case (_, rt, rid) => (rt, rid) }; Some((m._2, m._3)) }
      }
      def fwd(k: Long, lt: Long): Option[(Long, Long)] = {
        val e = rs.filter { case (rk, rt, _) => rk == k && (if (strict) rt > lt else rt >= lt) }
        if (e.isEmpty) None else { val m = e.minBy { case (_, rt, rid) => (rt, rid) }; Some((m._2, m._3)) }
      }
      val tag = s"seed=$seed strict=$strict bucket=$bucket"
      val gotB = asofMap(AsOfJoin.backward(lf(ls: _*), rf(rs: _*), Seq("k"), "lt", "rt",
        rightVals = Seq("rid"), strict = strict, tieBreak = Seq("rid"), timeBucket = bucket))
      assert(gotB == ls.map { case (k, lt, lid) => lid -> back(k, lt).map(_._2) }.toMap,
        s"backward $tag")
      val gotF = asofMap(AsOfJoin.forward(lf(ls: _*), rf(rs: _*), Seq("k"), "lt", "rt",
        rightVals = Seq("rid"), strict = strict, tieBreak = Seq("rid"), timeBucket = bucket))
      assert(gotF == ls.map { case (k, lt, lid) => lid -> fwd(k, lt).map(_._2) }.toMap,
        s"forward $tag")
      val gotN = asofMap(AsOfJoin.nearest(lf(ls: _*), rf(rs: _*), Seq("k"), "lt", "rt",
        rightVals = Seq("rid"), strict = strict, tieBreak = Seq("rid"), timeBucket = bucket))
      val expN = ls.map { case (k, lt, lid) =>
        lid -> ((back(k, lt), fwd(k, lt)) match {
          case (Some((bt, bid)), Some((ft, fid))) =>
            Some(if (lt - bt <= ft - lt) bid else fid) // ties → backward
          case (Some((_, bid)), None) => Some(bid)
          case (None, Some((_, fid))) => Some(fid)
          case _ => None
        })
      }.toMap
      assert(gotN == expN, s"nearest $tag")
    }
  }

  test("asof timeBucket plan: carry attaches by broadcast, bucket reaches the window") {
    val df = AsOfJoin.backward(lf((1L, 10L, 100L)), rf((1L, 5L, 200L)),
      Seq("k"), "lt", "rt", rightVals = Seq("rid"), timeBucket = Some(16L))
    df.collect() // let AQE finalize the join strategy from real sizes
    // AdaptiveSparkPlan.toString appends the pre-AQE "Initial Plan" — only
    // the final section describes what actually ran.
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // With a bounded carry table AQE must attach it by broadcast hash join
    // — the big side then shuffles ONCE, on (keys, bucket), for the window.
    // (A huge carry falls back to a (keys, bucket) sort-merge join: a
    // second big shuffle, still never a per-key serialization.)
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      s"carry join must broadcast at this size:\n$plan")
    // the window partitioning really includes the time bucket (the skew
    // split is in the plan, not just the API)
    assert(plan.contains("windowspecdefinition(k#") &&
        plan.contains("__graft_asof_bk"),
      s"bucket column missing from the window partitioning:\n$plan")
  }

  test("asof timeBucket mode: null keys/times and torn payloads behave like the plain path") {
    // null-key rows window together and must receive carry via the
    // null-safe join; null-time lefts still match nothing; a carried
    // payload travels as one struct (no tearing across buckets).
    val left = frame(lSchema, Seq(
      Map[String, Any]("k" -> null, "lt" -> 25L, "lid" -> 100L),
      Map[String, Any]("k" -> null, "lt" -> null, "lid" -> 101L),
      Map[String, Any]("k" -> 1L, "lt" -> 25L, "lid" -> 102L)))
    val right = frame(rSchema, Seq(
      Map[String, Any]("k" -> null, "rt" -> 3L, "rid" -> 200L),
      Map[String, Any]("k" -> 1L, "rt" -> 4L, "rid" -> null))) // null payload
    for (bucket <- Seq(None, Some(10L))) {
      val got = asofMap(AsOfJoin.backward(left, right, Seq("k"), "lt", "rt",
        rightVals = Seq("rid"), tieBreak = Seq("rid"), timeBucket = bucket))
      // lid 100: null key matches the null-key right (carry crosses buckets
      // 0 -> 2 in bucketed mode). lid 101: null time, no match. lid 102:
      // the matched right's own rid is null — must stay null, not torn.
      assert(got == Map(100L -> Some(200L), 101L -> None, 102L -> None),
        s"bucket=$bucket got $got")
    }
  }

  test("range join: half-open bounds, multi-bucket spans, overlaps, empty intervals") {
    val points = frame(
      StructType(Seq(StructField("k", LongType), StructField("p", LongType), StructField("pid", LongType))),
      Seq(
        Map[String, Any]("k" -> 1L, "p" -> 10L, "pid" -> 1L),  // == lo of [10,40): in
        Map[String, Any]("k" -> 1L, "p" -> 40L, "pid" -> 2L),  // == hi of [10,40): out
        Map[String, Any]("k" -> 1L, "p" -> 35L, "pid" -> 3L),  // in [10,40) and [30,50)
        Map[String, Any]("k" -> 2L, "p" -> 35L, "pid" -> 4L),  // right value, wrong key
        Map[String, Any]("k" -> 1L, "p" -> 60L, "pid" -> 5L))) // in no interval
    val intervals = frame(
      StructType(Seq(StructField("k", LongType), StructField("lo", LongType),
        StructField("hi", LongType), StructField("iid", LongType))),
      Seq(
        Map[String, Any]("k" -> 1L, "lo" -> 10L, "hi" -> 40L, "iid" -> 10L), // spans buckets 1..3 at width 16
        Map[String, Any]("k" -> 1L, "lo" -> 30L, "hi" -> 50L, "iid" -> 11L),
        Map[String, Any]("k" -> 1L, "lo" -> 70L, "hi" -> 70L, "iid" -> 12L))) // empty
    val joined = RangeJoin.join(points, intervals, Seq("k"), "p", "lo", "hi", bucketWidth = 16L)
    val got = joined.select(col("pid"), col("iid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (3L, 10L), (3L, 11L), (2L, 11L)))
    // Exactly once per qualifying pair even when an interval spans buckets.
    assert(joined.count() == 4L)
  }

  test("asof: a matched right row's null payload stays null (no tearing)") {
    // right at t=20 wins, and its NULL rid must NOT be backfilled from the
    // older right at t=10 (the payload travels as one struct per row).
    val left = lf((1L, 25L, 100L))
    val right = frame(rSchema, Seq(
      Map[String, Any]("k" -> 1L, "rt" -> 10L, "rid" -> 200L),
      Map[String, Any]("k" -> 1L, "rt" -> 20L, "rid" -> null)))
    val gotB = asofMap(AsOfJoin.backward(left, right, Seq("k"), "lt", "rt",
      rightVals = Seq("rid")))
    assert(gotB == Map(100L -> None))
    // forward mirror: from t=15 the earliest later right (t=20) has the
    // null payload — it must not be backfilled by a scan past it
    val left2 = lf((1L, 15L, 101L))
    val gotF = asofMap(AsOfJoin.forward(left2, right, Seq("k"), "lt", "rt",
      rightVals = Seq("rid")))
    assert(gotF == Map(101L -> None))
  }

  test("asof: null timestamps match nothing in any direction") {
    val left = frame(lSchema, Seq(
      Map[String, Any]("k" -> 1L, "lt" -> null, "lid" -> 100L),
      Map[String, Any]("k" -> 1L, "lt" -> 15L, "lid" -> 101L)))
    val right = frame(rSchema, Seq(
      Map[String, Any]("k" -> 1L, "rt" -> null, "rid" -> 200L),
      Map[String, Any]("k" -> 1L, "rt" -> 10L, "rid" -> 201L)))
    // null-time left matches nothing anywhere; the real left (t=15) never
    // sees the null-time right — only the valid right at t=10 can match,
    // and only in the directions where 10 qualifies against 15.
    val expected = Seq(
      (AsOfJoin.backward _, Some(201L)),
      (AsOfJoin.forward _, None),
      (AsOfJoin.nearest _, Some(201L)))
    for ((dir, exp101) <- expected) {
      val got = asofMap(dir(left, right, Seq("k"), "lt", "rt",
        Seq("rid"), false, Seq("rid"), "asof_", None))
      assert(got(100L).isEmpty, "null-time left must not match")
      assert(got(101L) == exp101)
    }
  }

  test("both joins reject ambiguous column layouts loudly") {
    val l = lf((1L, 10L, 100L)).withColumnRenamed("lid", "asof_rid")
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(l, rf((1L, 5L, 200L)), Seq("k"), "lt", "rt", rightVals = Seq("rid"))
    }
    val pts = lf((1L, 10L, 100L)) // has "lt" on both sides, not a key
    intercept[IllegalArgumentException] {
      RangeJoin.join(pts, pts.withColumn("hi", col("lt") + 1L),
        Seq("k"), "lt", "lt", "hi", 16L)
    }
  }

  test("asof nearest: distance compare survives extreme-range epochs (no long wrap)") {
    // Left at Long.MinValue+10, backward match at Long.MinValue+5 (distance
    // 5), forward match at Long.MaxValue-5 (distance ~2^64): the raw long
    // forward-distance subtraction would wrap negative and steal the match.
    val lo = Long.MinValue + 10L
    val left = lf((1L, lo, 100L))
    val right = rf((1L, lo - 5L, 200L), (1L, Long.MaxValue - 5L, 201L))
    val got = asofMap(AsOfJoin.nearest(left, right, Seq("k"), "lt", "rt",
      rightVals = Seq("rid"), tieBreak = Seq("rid")))
    assert(got == Map(100L -> Some(200L)))
    // Mirror: forward is the close one, backward is at the far extreme.
    val hi = Long.MaxValue - 10L
    val left2 = lf((1L, hi, 101L))
    val right2 = rf((1L, hi + 5L, 301L), (1L, Long.MinValue + 5L, 300L))
    val got2 = asofMap(AsOfJoin.nearest(left2, right2, Seq("k"), "lt", "rt",
      rightVals = Seq("rid"), tieBreak = Seq("rid")))
    assert(got2 == Map(101L -> Some(301L)))
  }

  test("range join: interval wider than maxBucketsPerInterval fails with an attributed error") {
    val points = frame(
      StructType(Seq(StructField("k", LongType), StructField("p", LongType))),
      Seq(Map[String, Any]("k" -> 1L, "p" -> 10L)))
    val intervals = frame(
      StructType(Seq(StructField("k", LongType), StructField("lo", LongType), StructField("hi", LongType))),
      Seq(Map[String, Any]("k" -> 1L, "lo" -> 0L, "hi" -> 1000L)))
    val ex = intercept[Exception] {
      RangeJoin.join(points, intervals, Seq("k"), "p", "lo", "hi",
        bucketWidth = 16L, maxBucketsPerInterval = 8L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(m => m.contains("RangeJoin") && m.contains("width 16")),
      s"expected a RangeJoin-attributed error naming the width, got: ${messages(ex)}")
    // A legal span at the same width still works with the default guard.
    assert(RangeJoin.join(points, intervals, Seq("k"), "p", "lo", "hi",
      bucketWidth = 16L).count() == 1L)
  }

  test("range join plan is an equi-join — no cartesian / nested-loop") {
    val points = frame(
      StructType(Seq(StructField("k", LongType), StructField("p", LongType))),
      Seq(Map[String, Any]("k" -> 1L, "p" -> 10L)))
    val intervals = frame(
      StructType(Seq(StructField("k", LongType), StructField("lo", LongType), StructField("hi", LongType))),
      Seq(Map[String, Any]("k" -> 1L, "lo" -> 0L, "hi" -> 20L)))
    val plan = RangeJoin.join(points, intervals, Seq("k"), "p", "lo", "hi", 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range join must stay an equi-join, got:\n$plan")
  }
}
