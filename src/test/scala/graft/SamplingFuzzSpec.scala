package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Differential fuzzer for the sampling/sharding family
 * ([[graft.operators.Sampling]]): random corpus subsets × weight formulas
 * × k/n/budget × salts, each case against a DuckDB oracle built from the
 * same model (the battery CTE mirrors, parameterized). What this pins
 * beyond the battery's single configuration:
 *
 *  - weightedSample: the ticket contract (max of w salted md5 strings)
 *    and the (ticket desc, id) cut across k from 1 to beyond-corpus-size
 *    — boundary ranks are where a float-keyed variant would diverge, and
 *    where TakeOrderedAndProject's per-partition heaps must agree with
 *    the oracle's single global sort.
 *  - weightedSamplePerKey: the per-key rank under every weight/subset mix.
 *  - weightedKeepExpected: the k·w/W rate with W computed over the SAME
 *    subset (a mirror that recomputed W over the full corpus would keep a
 *    different set — the broken-mirror probe used in development).
 *  - shardByBudget: the two-phase prefix sum vs the oracle's single
 *    global window across budgets that produce 1..hundreds of shards.
 *
 * Mirror-verification: the oracles were checked against deliberately
 * broken variants during development (wrong salt in the keep-rate draw →
 * 10 MISMATCH rows across the 6 committed configs) — agreement is not
 * same-bug-same-code. Note the doc_id tie-break in the rank oracles is
 * UNFALSIFIABLE on this corpus by design: it only fires on exact md5
 * ticket collisions, which never occur — it exists for the total-order
 * contract, not as observed behavior.
 */
class SamplingFuzzSpec extends SparkSpec {

  private val sfDir = sys.env.getOrElse("GRAFT_FUZZ_SF", "/root/testdata/sf0.001")
  private val N = sys.env.get("GRAFT_FUZZ_N").map(_.toInt).getOrElse(6)
  private val Seed = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(FuzzRound.seed)

  private def parquet = s"$sfDir/documents.parquet"
  private def sqlStr(s: String) = "'" + s.replace("'", "''") + "'"

  /** Random (subset, weight) config shared by all four families. */
  private final case class Cfg(m: Int, r: Int, d: Int, wMax: Int, salt: String) {
    def desc = s"m=$m r=$r d=$d wMax=$wMax salt=$salt"
    def subsetSql = s"doc_id % $m = $r"
    def weightSql = s"1 + (n_chars // $d) % $wMax"
    def baseCte =
      s"""d AS (SELECT doc_id, source,
         |  $weightSql AS w FROM read_parquet(${sqlStr(parquet)})
         |  WHERE $subsetSql)""".stripMargin
    def ticketSql =
      s"list_max(list_transform(range(w), j -> md5('$salt:' || CAST(doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR))))"
    def sparkBase(spark: org.apache.spark.sql.SparkSession): DataFrame =
      graft.ops.Tables.documents(spark, sfDir)
        .where(pmod(col("doc_id"), lit(m)) === r)
        .withColumn("w", expr(s"1L + (n_chars div $d) % $wMax"))
        .select(col("doc_id"), col("source"), col("w"))
  }

  private def genCfg(rnd: Random, i: Int): Cfg = {
    val m = 1 + rnd.nextInt(4)
    Cfg(m, rnd.nextInt(m), Seq(100, 200, 400, 800)(rnd.nextInt(4)),
      Seq(2, 4, 8)(rnd.nextInt(3)), s"fz$i")
  }

  test(s"$N sampling configs × 4 operators match DuckDB oracles") {
    assume(DuckOracle.available, "duckdb not importable")
    val rnd = new Random(Seed + 7)
    val cases = (0 until N).flatMap { i =>
      val cfg = genCfg(rnd, i)
      val k = Seq(1, 7, 50, 100000)(rnd.nextInt(4))
      val perKeyN = 1 + rnd.nextInt(10)
      val keepK = Seq(5L, 40L, 300L)(rnd.nextInt(3))
      val budget = Seq(500L, 2000L, 10000L)(rnd.nextInt(3))

      val sampleSql =
        s"""WITH ${cfg.baseCte},
           |t AS (SELECT doc_id, w, ${cfg.ticketSql} AS ticket FROM d)
           |SELECT doc_id, w, ticket FROM t
           |ORDER BY ticket DESC, doc_id LIMIT $k""".stripMargin
      val perKeySql =
        s"""WITH ${cfg.baseCte},
           |t AS (SELECT doc_id, source, ${cfg.ticketSql} AS ticket FROM d),
           |r AS (SELECT doc_id, source, row_number() OVER (
           |  PARTITION BY source ORDER BY ticket DESC, doc_id) AS rk FROM t)
           |SELECT doc_id, source FROM r WHERE rk <= $perKeyN""".stripMargin
      val keepSql =
        s"""WITH ${cfg.baseCte},
           |tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM d)
           |SELECT w, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_sum
           |FROM d, tot
           |WHERE ('0x' || substr(md5('${cfg.salt}:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           |      / 4294967296.0 < $keepK.0 * CAST(w AS DOUBLE) / CAST(tw AS DOUBLE)
           |GROUP BY w""".stripMargin
      val shardSql =
        s"""WITH s0 AS (SELECT doc_id,
           |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           |    md5('${cfg.salt}:' || CAST(doc_id AS VARCHAR)) AS o
           |  FROM read_parquet(${sqlStr(parquet)}) WHERE ${cfg.subsetSql})
           |SELECT doc_id, n_tokens,
           |  CAST(coalesce(sum(n_tokens) OVER (ORDER BY o, doc_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // $budget
           |    AS BIGINT) AS shard
           |FROM s0""".stripMargin

      Seq(
        (s"sample_$i", s"weightedSample k=$k ${cfg.desc}", sampleSql, () =>
          operators.Sampling.weightedSample(cfg.sparkBase(spark), "doc_id", "w", k, cfg.salt)
            .select(col("doc_id"), col("w"), col("ticket"))),
        (s"perkey_$i", s"weightedSamplePerKey n=$perKeyN ${cfg.desc}", perKeySql, () =>
          operators.Sampling.weightedSamplePerKey(
              cfg.sparkBase(spark), "source", "doc_id", "w", perKeyN, cfg.salt)
            .select(col("doc_id"), col("source"))),
        (s"keep_$i", s"weightedKeepExpected k=$keepK ${cfg.desc}", keepSql, () =>
          operators.Sampling.weightedKeepExpected(
              cfg.sparkBase(spark), "doc_id", "w", keepK, cfg.salt)
            .groupBy(col("w"))
            .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("id_sum"))),
        (s"shard_$i", s"shardByBudget budget=$budget ${cfg.desc}", shardSql, () =>
          operators.Sampling.shardByBudget(
            graft.ops.Tables.documents(spark, sfDir)
              .where(pmod(col("doc_id"), lit(cfg.m)) === cfg.r),
            "doc_id", operators.TextAnalysis.tokenCount(col("text")),
            budget, cfg.salt)))
    }
    val duck = DuckOracle.run(cases.map(c => c._1 -> c._3).toMap)
    val problems = DuckOracle.evalAll(cases, duck)
    assert(problems.isEmpty, problems.mkString("\n\n"))
  }
}
