package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Differential fuzzer for the window-partitioned operator family:
 * [[graft.operators.Sessionize]] (random gaps × timestamp grids that
 * manufacture tie groups × key moduli) and [[graft.operators.Skew]]'s
 * salted two-phase top-N (random n × salt counts incl. 1 × tied ordering
 * values), each vs a DuckDB oracle.
 *
 * The sessionize oracle is deliberately NOT a transliteration of the
 * implementation: engines may order equal timestamps differently between
 * the lag pass and the running-sum pass, so the oracle computes boundaries
 * over DISTINCT (key, time) pairs — tie-order-free by construction — and
 * joins session ids back to rows. Agreement therefore pins the operator's
 * documented claim that tied timestamps always land in one session, not
 * just "same code, same bug".
 *
 * The top-N oracle is the plain `row_number` window the salted two-phase
 * form replaces — exactness across salt counts is the operator's whole
 * contract (Skew.scala: a true top-N row cannot be cut from any salt's
 * local top N).
 */
object WindowFuzzer {
  final case class Case(name: String, desc: String, sql: String,
                        spark: () => DataFrame)

  private def sqlStr(s: String) = "'" + s.replace("'", "''") + "'"

  def genSessionize(i: Int, rnd: Random, parquet: String): Case = {
    val kMod = Seq(3, 5, 9, 15)(rnd.nextInt(4))
    val grid = Seq(1L, 1000000L, 60000000L, 3600000000L)(rnd.nextInt(4))
    val gap  = Seq(1L, 1000000L, 60000000L, 3600000000L, 86400000000L)(rnd.nextInt(5))
    val (m, r) = { val mm = 1 + rnd.nextInt(3); (mm, rnd.nextInt(mm)) }
    val summary = rnd.nextBoolean()
    val desc = s"sessionize kMod=$kMod grid=$grid gap=$gap filter=$m/$r summary=$summary"

    val tSql = if (grid == 1) "tl" else s"(tl // $grid) * $grid"
    val body =
      s"""WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS tl
         |  FROM read_parquet(${sqlStr(parquet)})),
         |base AS (SELECT user_id % $kMod AS k, $tSql AS t
         |  FROM e WHERE event_id % $m = $r),
         |dt AS (SELECT DISTINCT k, t FROM base),
         |nb AS (SELECT k, t,
         |    CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > $gap
         |      THEN 1 ELSE 0 END AS b
         |  FROM dt WINDOW w AS (PARTITION BY k ORDER BY t)),
         |sx AS (SELECT k, t, SUM(b) OVER
         |    (PARTITION BY k ORDER BY t ROWS UNBOUNDED PRECEDING) - 1 AS sid
         |  FROM nb),
         |rows_sid AS (SELECT base.k, base.t, sx.sid
         |  FROM base JOIN sx ON base.k = sx.k AND base.t = sx.t),
         |sess AS (SELECT k, sid AS session_idx, count(*) AS n_events,
         |    min(t) AS start_ts, max(t) AS end_ts
         |  FROM rows_sid GROUP BY k, sid)""".stripMargin
    val sql =
      if (summary)
        s"""$body
           |SELECT k, count(*) AS n_sessions, max(n_events) AS max_session_events,
           |  max(end_ts - start_ts) AS longest_session_span
           |FROM sess GROUP BY k""".stripMargin
      else s"$body\nSELECT k, session_idx, n_events, start_ts, end_ts FROM sess"

    Case(s"sess_$i", desc, sql, () => {
      val s = SparkSpec.spark
      val tl = expr("ts div 1000")
      val t = if (grid == 1) tl else graft.util.Arith.floorDiv(tl, grid) * grid
      val base = graft.ops.Tables.events(s, new java.io.File(parquet).getParent)
        .where(col("event_id") % m === r)
        .select((col("user_id") % kMod).as("k"), t.as("t"))
      if (summary) graft.operators.Sessionize.groupSummary(base, "k", "t", gap)
      else graft.operators.Sessionize.sessions(base, "k", "t", gap)
    })
  }

  /** Both per-key cap variants are pure functions of (id, salt) — the
    * engine-parity contract TextAnalysis documents — so the fuzz compares
    * the kept row SET exactly, a stronger check than the battery's
    * error-gate on the approx variant. Null keys are in scope: both caps
    * group them like a value (the hot null-ish default key is the approx
    * variant's whole reason to exist); the oracle mirrors with GROUP BY's
    * null group + IS NOT DISTINCT FROM. */
  def genCap(i: Int, rnd: Random, parquet: String): Case = {
    val approx = i % 2 == 1
    val kMod = Seq(2, 3, 5, 9)(rnd.nextInt(4))
    val n = Seq(1, 3, 10, 100)(rnd.nextInt(4))
    val salt = s"fz${rnd.nextInt(1000)}"
    val nullKeys = rnd.nextInt(3) == 0
    val (m, r) = { val mm = 1 + rnd.nextInt(3); (mm, rnd.nextInt(mm)) }
    val desc = s"cap${if (approx) "Approx" else ""} kMod=$kMod n=$n " +
      s"salt=$salt nullKeys=$nullKeys filter=$m/$r"

    val kSql = if (nullKeys) s"CASE WHEN user_id % 7 = 0 THEN NULL ELSE user_id % $kMod END"
               else s"user_id % $kMod"
    val md5Sql = s"md5('$salt:' || CAST(eid AS VARCHAR))"
    val body =
      s"""WITH e AS (SELECT event_id, user_id FROM read_parquet(${sqlStr(parquet)})),
         |base AS (SELECT $kSql AS k, event_id AS eid
         |  FROM e WHERE event_id % $m = $r)""".stripMargin
    val sql =
      if (approx)
        s"""$body,
           |cnt AS (SELECT k, count(*) AS c FROM base GROUP BY k)
           |SELECT b.k, b.eid FROM base b JOIN cnt ON b.k IS NOT DISTINCT FROM cnt.k
           |WHERE (('0x' || substr(md5('$salt:' || CAST(b.eid AS VARCHAR)), 1, 8))::BIGINT
           |       / 4294967296.0) < CAST($n AS DOUBLE) / cnt.c""".stripMargin
      else
        s"""$body
           |SELECT k, eid FROM (
           |  SELECT k, eid, row_number() OVER
           |    (PARTITION BY k ORDER BY $md5Sql, eid) AS rk FROM base)
           |WHERE rk <= $n""".stripMargin

    Case(s"cap_$i", desc, sql, () => {
      val s = SparkSpec.spark
      val kSpark = if (nullKeys)
        when(col("user_id") % 7 === 0, lit(null).cast("long")).otherwise(col("user_id") % kMod)
      else col("user_id") % kMod
      val base = graft.ops.Tables.events(s, new java.io.File(parquet).getParent)
        .where(col("event_id") % m === r)
        .select(kSpark.as("k"), col("event_id").as("eid"))
      val capped =
        if (approx) graft.operators.TextAnalysis.capPerKeyApprox(base, "k", "eid", n, salt)
        else graft.operators.TextAnalysis.capPerKey(base, "k", "eid", n, salt)
      capped.select(col("k"), col("eid"))
    })
  }

  def genTopN(i: Int, rnd: Random, parquet: String): Case = {
    val kMod  = Seq(3, 5, 9, 15)(rnd.nextInt(4))
    val n     = Seq(1, 2, 5, 20)(rnd.nextInt(4))
    val salts = Seq(1, 2, 7, 64)(rnd.nextInt(4))
    val vMod  = Seq(4, 17, 1000)(rnd.nextInt(3)) // small → heavy ordering ties
    val desc_ = rnd.nextBoolean()
    val (m, r) = { val mm = 1 + rnd.nextInt(3); (mm, rnd.nextInt(mm)) }
    val desc = s"topN kMod=$kMod n=$n salts=$salts vMod=$vMod desc=${desc_} filter=$m/$r"

    val dir = if (desc_) "DESC" else "ASC"
    val sql =
      s"""WITH e AS (SELECT event_id, user_id FROM read_parquet(${sqlStr(parquet)})),
         |base AS (SELECT user_id % $kMod AS k, event_id AS eid, event_id % $vMod AS v
         |  FROM e WHERE event_id % $m = $r)
         |SELECT k, eid, rk FROM (
         |  SELECT k, eid, row_number() OVER
         |    (PARTITION BY k ORDER BY v $dir, eid ASC) AS rk FROM base)
         |WHERE rk <= $n""".stripMargin

    Case(s"topn_$i", desc, sql, () => {
      val s = SparkSpec.spark
      val base = graft.ops.Tables.events(s, new java.io.File(parquet).getParent)
        .where(col("event_id") % m === r)
        .select((col("user_id") % kMod).as("k"), col("event_id").as("eid"),
          (col("event_id") % vMod).as("v"))
      val ord = Seq(if (desc_) col("v").desc else col("v").asc, col("eid").asc)
      graft.operators.Skew.topNPerKey(base, "k", "eid", ord, n, salts,
        keepRank = Some("rk")).select(col("k"), col("eid"), col("rk"))
    })
  }
}

class WindowFuzzSpec extends SparkSpec {
  import WindowFuzzer._

  private val sfDir = sys.env.getOrElse("GRAFT_FUZZ_SF", "/root/testdata/sf0.001")
  private val N = sys.env.get("GRAFT_FUZZ_N").map(_.toInt).getOrElse(24)
  private val Seed = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(FuzzRound.seed)

  test(s"$N sessionize + $N salted top-N + $N per-key cap fuzzed configs match DuckDB oracles") {
    assume(DuckOracle.available, "python3 + duckdb unavailable — differential fuzz skipped")
    val parquet = s"$sfDir/events.parquet"
    assume(new java.io.File(parquet).exists(), s"$parquet missing")

    val rnd = new Random(Seed)
    val cases =
      (0 until N).map(i => genSessionize(i, rnd, parquet)) ++
        (0 until N).map(i => genTopN(i, rnd, parquet)) ++
        (0 until N).map(i => genCap(i, rnd, parquet))

    val duck = DuckOracle.run(cases.map(c => c.name -> c.sql).toMap)
    val failures = DuckOracle.evalAll(
      cases.map(c => (c.name, c.desc, c.sql, c.spark)), duck)
    assert(failures.isEmpty,
      s"${failures.size} of ${cases.size} fuzzed window configs diverged (seed=$Seed):\n\n" +
        failures.take(8).mkString("\n\n"))
  }
}
