package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Randomized differential fuzzer for the temporal-join family, the
 * companion of [[FuzzSpec]] (which covers the fr query language): seeded
 * random configurations of [[graft.operators.AsOfJoin]] (3 directions ×
 * strict × hot-key `timeBucket` mode × 1-2 keys × null keys/times ×
 * duplicate-timestamp grids) and [[graft.operators.RangeJoin]] (spans incl.
 * empty × bucket widths from exact to 64×-fine) over the real sf0.001
 * events table, each checked row-for-row against a DuckDB oracle built
 * from the SAME random model — per-left-row `LEFT JOIN LATERAL ... LIMIT 1`
 * with the operator's documented eligibility and tie-break order spelled
 * out, and a plain predicate join for ranges. The battery pins ONE
 * hand-built query per operator; this sweeps the semantic corners
 * (equal-time ties under strictness, nearest's backward preference,
 * null-key grouping vs null-key dropping, carry-join widths down to 1)
 * where a window-based implementation could silently diverge.
 */
object JoinFuzzer {
  /** One fuzz case: the Spark frame (deferred) and its oracle SQL, both
    * projecting identical column lists. */
  final case class Case(name: String, desc: String, sql: String,
                        spark: () => DataFrame)

  private def sqlStr(s: String) = "'" + s.replace("'", "''") + "'"

  /** Shared derivations, one string per engine pair. Times are µs longs
    * (ts div 1000 ↔ epoch_ns(ts)//1000 — positive, so truncate == floor);
    * grids coarsen via exact integer floor-div on both sides. */
  final case class Cols(kMod: Int, twoKeys: Boolean, nullKeys: Boolean,
                        grid: Long, nullTimeMod: Int, tsTyped: Boolean = false) {
    // null keys ride on user_id % 7 (15 users → ~2 null-key users); null
    // times on event_id % nullTimeMod (0 = never).
    def kSql = if (nullKeys) s"CASE WHEN user_id % 7 = 0 THEN NULL ELSE user_id % $kMod END"
               else s"user_id % $kMod"
    def kSpark = if (nullKeys)
        when(col("user_id") % 7 === 0, lit(null).cast("long")).otherwise(col("user_id") % kMod)
      else col("user_id") % kMod
    private def gSql(base: String) = if (grid == 1) base else s"($base // $grid) * $grid"
    private def gSpark(base: org.apache.spark.sql.Column) =
      if (grid == 1) base else graft.util.Arith.floorDiv(base, grid) * grid
    // tsTyped exercises the non-integral time path (TimestampType: interval
    // distance compare in nearest instead of the decimal widening).
    def tSql: String = {
      val g0 = gSql("tl")
      val g = if (tsTyped) s"make_timestamp($g0)" else g0
      if (nullTimeMod == 0) g else s"CASE WHEN event_id % $nullTimeMod = 0 THEN NULL ELSE $g END"
    }
    def tSpark: org.apache.spark.sql.Column = {
      val g0 = gSpark(expr("ts div 1000"))
      val g = if (tsTyped) timestamp_micros(g0) else g0
      if (nullTimeMod == 0) g
      else when(col("event_id") % nullTimeMod === 0,
        lit(null).cast(if (tsTyped) "timestamp" else "long")).otherwise(g)
    }
    def keyNames: Seq[String] = if (twoKeys) Seq("k", "k2") else Seq("k")
  }

  def genAsOf(i: Int, rnd: Random, parquet: String): Case = {
    val dir    = rnd.nextInt(3) // 0 backward, 1 forward, 2 nearest
    val strict = rnd.nextBoolean()
    val grids  = Seq(1L, 1000000L, 60000000L, 3600000000L)
    // Timestamp-typed cases exercise the interval-distance branch; the
    // timeBucket skew mode contracts an integral time column, so it stays
    // off there.
    val tsTyped = rnd.nextInt(4) == 0
    val cols = Cols(
      kMod = Seq(3, 5, 9, 16)(rnd.nextInt(4)),
      twoKeys = rnd.nextInt(10) < 3,
      nullKeys = rnd.nextInt(4) == 0,
      grid = grids(rnd.nextInt(grids.size)),
      nullTimeMod = if (rnd.nextBoolean()) 11 else 0,
      tsTyped = tsTyped)
    val rGrid = grids(rnd.nextInt(grids.size))
    val rCols = cols.copy(grid = rGrid, nullTimeMod = if (rnd.nextInt(3) == 0) 13 else 0)
    val (lm, lr) = { val m = 2 + rnd.nextInt(3); (m, rnd.nextInt(m)) }
    val (rm, rr) = { val m = 2 + rnd.nextInt(3); (m, rnd.nextInt(m)) }
    val timeBucket =
      if (!tsTyped && rnd.nextInt(5) < 2)
        Some(Seq(1L, 3600000000L, 86400000000L * 30)(rnd.nextInt(3)))
      else None

    val dirName = Seq("backward", "forward", "nearest")(dir)
    val desc = s"$dirName strict=$strict keys=${cols.keyNames.size} " +
      s"kMod=${cols.kMod} nullKeys=${cols.nullKeys} lGrid=${cols.grid} rGrid=$rGrid " +
      s"nullT=${cols.nullTimeMod}/${rCols.nullTimeMod} timeBucket=$timeBucket ts=$tsTyped"

    val k2l = if (cols.twoKeys) ", event_id % 2 AS k2" else ""
    val selK2 = if (cols.twoKeys) ", l.k2" else ""
    val onK2 = if (cols.twoKeys) " AND r.k2 IS NOT DISTINCT FROM l.k2" else ""
    // Distance arithmetic in µs for timestamp-typed cases (DuckDB
    // timestamp subtraction yields INTERVAL); comparisons work either way.
    def us(x: String) = if (tsTyped) s"epoch_us($x)" else x
    val (pred, ord) = dir match {
      case 0 => (s"r.rt ${if (strict) "<" else "<="} l.t", "r.rt DESC, r.rid DESC")
      case 1 => (s"r.rt ${if (strict) ">" else ">="} l.t", "r.rt ASC, r.rid ASC")
      case _ => (if (strict) "r.rt <> l.t" else "TRUE",
        s"abs(${us("r.rt")} - ${us("l.t")}) ASC, (r.rt > l.t) ASC, " +
          "(CASE WHEN r.rt <= l.t THEN -r.rid ELSE r.rid END) ASC")
    }
    val sql =
      s"""WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS tl
         |  FROM read_parquet(${sqlStr(parquet)})),
         |l AS (SELECT event_id AS lid, ${cols.kSql} AS k$k2l, ${cols.tSql} AS t
         |  FROM e WHERE event_id % $lm = $lr),
         |r AS (SELECT event_id AS rid, ${rCols.kSql} AS k$k2l, ${rCols.tSql} AS rt
         |  FROM e WHERE event_id % $rm = $rr)
         |SELECT l.lid, l.k$selK2, ${if (tsTyped) "epoch_us(l.t)" else "l.t"} AS t,
         |  m.rid AS m_rid, ${if (tsTyped) "epoch_us(m.rt)" else "m.rt"} AS m_rt
         |FROM l LEFT JOIN LATERAL (
         |  SELECT r.rid, r.rt FROM r
         |  WHERE l.t IS NOT NULL AND r.k IS NOT DISTINCT FROM l.k$onK2 AND $pred
         |  ORDER BY $ord LIMIT 1
         |) m ON TRUE""".stripMargin

    Case(s"asof_$i", desc, sql, () => {
      val s = SparkSpec.spark
      val e = graft.ops.Tables.events(s, new java.io.File(parquet).getParent)
      def side(c: Cols, idCol: String, tCol: String, m: Int, r: Int) = {
        var d = e.where(col("event_id") % m === r)
          .withColumn("k", c.kSpark)
          .withColumn(tCol, c.tSpark)
          .withColumn(idCol, col("event_id"))
        if (c.twoKeys) d = d.withColumn("k2", col("event_id") % 2)
        d.select((idCol +: c.keyNames :+ tCol).map(col): _*)
      }
      val l = side(cols, "lid", "t", lm, lr)
      val r = side(rCols, "rid", "rt", rm, rr)
      val fn = dir match {
        case 0 => graft.operators.AsOfJoin.backward _
        case 1 => graft.operators.AsOfJoin.forward _
        case _ => graft.operators.AsOfJoin.nearest _
      }
      val out = fn(l, r, cols.keyNames, "t", "rt", Seq("rid", "rt"), strict, Seq("rid"),
        "m_", timeBucket)
      val tOut = if (tsTyped) unix_micros(col("t")) else col("t")
      val rtOut = if (tsTyped) unix_micros(col("m_rt")) else col("m_rt")
      out.select((col("lid") +: cols.keyNames.map(col)) ++
        Seq(tOut.as("t"), col("m_rid"), rtOut.as("m_rt")): _*)
    })
  }

  def genRange(i: Int, rnd: Random, parquet: String): Case = {
    val grids = Seq(1L, 1000000L, 3600000000L)
    val cols = Cols(
      kMod = Seq(3, 5, 9)(rnd.nextInt(3)),
      twoKeys = rnd.nextInt(10) < 3,
      nullKeys = rnd.nextInt(4) == 0,
      grid = grids(rnd.nextInt(grids.size)),
      nullTimeMod = if (rnd.nextInt(3) == 0) 11 else 0)
    val iCols = cols.copy(grid = grids(rnd.nextInt(grids.size)), nullTimeMod = 0)
    val (pm, pr) = { val m = 2 + rnd.nextInt(3); (m, rnd.nextInt(m)) }
    val (im, ir) = { val m = 2 + rnd.nextInt(3); (m, rnd.nextInt(m)) }
    val span = Seq(0L, 1000000L, 3600000000L, 777777777L, 86400000000L)(rnd.nextInt(5))
    val width =
      if (span == 0) Seq(1L, 3600000000L)(rnd.nextInt(2))
      else math.max(1L, span / Seq(1L, 2L, 4L, 16L, 64L)(rnd.nextInt(5)))

    val desc = s"range kMod=${cols.kMod} keys=${cols.keyNames.size} " +
      s"nullKeys=${cols.nullKeys} pGrid=${cols.grid} iGrid=${iCols.grid} " +
      s"nullT=${cols.nullTimeMod} span=$span width=$width"

    val k2p = if (cols.twoKeys) ", event_id % 2 AS k2" else ""
    val onK2 = if (cols.twoKeys) " AND p.k2 = i.k2" else ""
    val sql =
      s"""WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS tl
         |  FROM read_parquet(${sqlStr(parquet)})),
         |p AS (SELECT event_id AS pid, ${cols.kSql} AS k$k2p, ${cols.tSql} AS pt
         |  FROM e WHERE event_id % $pm = $pr),
         |i AS (SELECT event_id AS iid, ${iCols.kSql} AS k$k2p, ${iCols.tSql} AS lo,
         |    ${iCols.tSql} + $span AS hi
         |  FROM e WHERE event_id % $im = $ir)
         |SELECT p.pid, i.iid FROM p, i
         |WHERE p.k = i.k$onK2 AND i.lo <= p.pt AND p.pt < i.hi""".stripMargin

    Case(s"range_$i", desc, sql, () => {
      val s = SparkSpec.spark
      val e = graft.ops.Tables.events(s, new java.io.File(parquet).getParent)
      var p = e.where(col("event_id") % pm === pr)
        .withColumn("k", cols.kSpark).withColumn("pt", cols.tSpark)
      var iv = e.where(col("event_id") % im === ir)
        .withColumn("k", iCols.kSpark).withColumn("lo", iCols.tSpark)
        .withColumn("hi", iCols.tSpark + span)
      if (cols.twoKeys) {
        p = p.withColumn("k2", col("event_id") % 2)
        iv = iv.withColumn("k2", col("event_id") % 2)
      }
      graft.operators.RangeJoin.join(
        p.select((Seq("pid" -> col("event_id")).map { case (n, c) => c.as(n) } ++
          cols.keyNames.map(col) :+ col("pt")): _*),
        iv.select((Seq("iid" -> col("event_id")).map { case (n, c) => c.as(n) } ++
          cols.keyNames.map(col) ++ Seq(col("lo"), col("hi"))): _*),
        cols.keyNames, "pt", "lo", "hi", width)
        .select(col("pid"), col("iid"))
    })
  }
}

class JoinFuzzSpec extends SparkSpec {
  import JoinFuzzer._

  private val sfDir = sys.env.getOrElse("GRAFT_FUZZ_SF", "/root/testdata/sf0.001")
  private val NAsOf = sys.env.get("GRAFT_FUZZ_N").map(_.toInt).getOrElse(48)
  private val NRange = NAsOf / 2
  private val Seed = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(FuzzRound.seed)

  test(s"$NAsOf as-of + $NRange range fuzzed join configs match DuckDB lateral oracles") {
    assume(DuckOracle.available, "python3 + duckdb unavailable — differential join fuzz skipped")
    val parquet = s"$sfDir/events.parquet"
    assume(new java.io.File(parquet).exists(), s"$parquet missing")

    val rnd = new Random(Seed)
    val cases =
      (0 until NAsOf).map(i => genAsOf(i, rnd, parquet)) ++
        (0 until NRange).map(i => genRange(i, rnd, parquet))

    val duck = DuckOracle.run(cases.map(c => c.name -> c.sql).toMap)
    val failures = DuckOracle.evalAll(
      cases.map(c => (c.name, c.desc, c.sql, c.spark)), duck)
    assert(failures.isEmpty,
      s"${failures.size} of ${cases.size} fuzzed join configs diverged (seed=$Seed):\n\n" +
        failures.take(8).mkString("\n\n"))
  }
}
