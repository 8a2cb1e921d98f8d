package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Differential fuzzer for the corpus-selection/profiling family
 * ([[graft.operators.Dsir]], [[graft.operators.Profile]],
 * [[graft.operators.Sampling.globalOrder]]): random corpus subsets ×
 * hashed-model widths × target slices × k × salts/epochs, each case
 * against an oracle built from the same model. What this pins beyond the
 * battery's single configuration:
 *
 *  - DSIR training: the materialized (bucket, lr_micro) fixture equals a
 *    pure driver-side Scala mirror of the add-one formula for EVERY
 *    (nBuckets, target-slice, subset) config — both sides use the same
 *    JVM `Math.log`, so this checks the distributed aggregation, not
 *    libm (`ln` never crosses an engine boundary — that is the design).
 *  - DSIR scoring/selection: per-doc integer weight sums and the
 *    (logw desc, id) top-k cut vs DuckDB reading the SAME fixture
 *    integers, across k from 1 to beyond-corpus-size.
 *  - DSIR Gumbel resampling: the quantized-noise key and its cut vs the
 *    DuckDB mirror of the identical floor(1e6·g((n+0.5)/2³²)) formula.
 *  - Profile: the long-form one-pass profile vs a per-column UNION ALL
 *    oracle generated from the same schema dispatch (numeric / string /
 *    string-cast), over random column subsets and row slices — null
 *    accounting, distinct counts, decimal-cast sums, typed min/max.
 *  - globalOrder: the two-phase distributed prefix-count rank vs the
 *    naive single-window row_number, across subsets × epochs.
 *  - interleaveOrder: per-key md5 rank + the (r − 0.5)/w stride across
 *    random subsets × weight formulas.
 *
 * Mirror-verification: the oracles were checked against deliberately
 * broken variants during development (dsir scoring mirror pointed at a
 * wrong-salt bucket hash → MISMATCH on every dsir/resample case;
 * globalOrder mirror with the epoch dropped from the salt → MISMATCH on
 * every order case; interleave mirror ranking by a wrong-salt md5 line →
 * MISMATCH on every interleave case) — agreement is not
 * same-bug-same-code.
 */
class SelectionFuzzSpec extends SparkSpec {

  private val sfDir = sys.env.getOrElse("GRAFT_FUZZ_SF", "/root/testdata/sf0.001")
  private val N = sys.env.get("GRAFT_FUZZ_N").map(_.toInt).getOrElse(4)
  private val Seed = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(FuzzRound.seed + 13)

  private def docsParquet = s"$sfDir/documents.parquet"
  private def liParquet   = s"$sfDir/lineitem.parquet"
  private def sqlStr(s: String) = "'" + s.replace("'", "''") + "'"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // --- driver-side DSIR mirror (pure Scala, same JVM Math.log) ----------

  private def grams(text: String): Seq[String] = {
    val ts = text.split(" ", -1).toSeq
    ts ++ ts.sliding(2).filter(_.size == 2).map(_.mkString(" "))
  }

  private def bucket(g: String, b: Int, salt: String): Long =
    java.lang.Long.parseLong(md5hex(s"$salt:$g").take(8), 16) % b

  private def mirrorModel(target: Seq[String], raw: Seq[String], b: Int,
                          salt: String): Map[Long, Long] = {
    val tg = target.flatMap(grams); val rg = raw.flatMap(grams)
    val ct = tg.groupBy(bucket(_, b, salt)).view.mapValues(_.size.toLong).toMap
    val cr = rg.groupBy(bucket(_, b, salt)).view.mapValues(_.size.toLong).toMap
    val (tt, tr) = (tg.size.toLong, rg.size.toLong)
    (0L until b).map { k =>
      k -> math.floor(1e6 * math.log(
        ((ct.getOrElse(k, 0L) + 1).toDouble * (tr + b).toDouble) /
        ((cr.getOrElse(k, 0L) + 1).toDouble * (tt + b).toDouble))).toLong
    }.toMap
  }

  test(s"$N selection configs × 4 operators match their oracles") {
    assume(DuckOracle.available, "duckdb not importable")
    val rnd = new Random(Seed)
    val tmp = java.nio.file.Files.createTempDirectory("selfuzz").toString

    val liCols = Seq("l_orderkey" -> "num", "l_partkey" -> "num",
      "l_linenumber" -> "num", "l_quantity" -> "num", "l_extendedprice" -> "num",
      "l_returnflag" -> "str", "l_linestatus" -> "str", "l_shipdate" -> "cast")

    val cases = (0 until N).flatMap { i =>
      val m = 1 + rnd.nextInt(3); val r = rnd.nextInt(m)
      val tm = 2 + rnd.nextInt(4); val tr = rnd.nextInt(tm)
      val b = Seq(32, 64, 128, 509)(rnd.nextInt(4))
      val k = Seq(1, 7, 50, 100000)(rnd.nextInt(4))
      val salt = s"sf$i"
      val fix = s"$tmp/m$i"
      val subsetSql = s"doc_id % $m = $r"

      // Train via the operator; pin the fixture against the driver mirror.
      val sub = graft.ops.Tables.documents(spark, sfDir)
        .where(pmod(col("doc_id"), lit(m)) === r)
      val target = sub.where(pmod(col("doc_id"), lit(tm)) === tr)
      graft.operators.Dsir.trainLogRatios(target, sub, "doc_id", "text", b, salt)
        .coalesce(1).write.mode("overwrite").parquet(fix)
      val texts = sub.select(col("doc_id"), col("text")).collect()
        .map(row => row.getLong(0) -> row.getString(1))
      val want = mirrorModel(
        texts.filter(_._1 % tm == tr).map(_._2).toSeq, texts.map(_._2).toSeq, b, salt)
      val got = spark.read.parquet(fix).collect()
        .map(row => row.getLong(0) -> row.getLong(1)).toMap
      assert(got == want, s"cfg $i: fixture != driver mirror (b=$b tm=$tm tr=$tr)")

      val scoreCtes =
        s"""t AS (SELECT doc_id, string_split(text, ' ') AS ts
           |      FROM read_parquet(${sqlStr(docsParquet)}) WHERE $subsetSql),
           |uni AS (SELECT doc_id, unnest(ts) AS gram FROM t),
           |bi AS (SELECT doc_id, ts[j] || ' ' || ts[j+1] AS gram
           |       FROM t, generate_series(1, 4000) s(j) WHERE j <= len(ts) - 1),
           |g AS (SELECT doc_id,
           |        ('0x' || substr(md5('$salt:' || gram), 1, 8))::BIGINT % $b AS bucket
           |      FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
           |mm AS (SELECT bucket, lr_micro FROM read_parquet(${sqlStr(s"$fix/*.parquet")})),
           |sc AS (SELECT g.doc_id, count(*) AS n_grams,
           |         CAST(sum(mm.lr_micro) AS BIGINT) AS logw_micro
           |       FROM g JOIN mm USING (bucket) GROUP BY g.doc_id)""".stripMargin
      val topSql =
        s"""WITH $scoreCtes
           |SELECT doc_id, n_grams, logw_micro FROM sc
           |ORDER BY logw_micro DESC, doc_id LIMIT $k""".stripMargin
      val resSql =
        s"""WITH $scoreCtes
           |SELECT doc_id, n_grams, logw_micro,
           |  logw_micro + CAST(floor(1e6 * -ln(-ln(
           |    ((('0x' || substr(md5('g$salt:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT)
           |     + 0.5) / 4294967296.0))) AS BIGINT) AS key_micro
           |FROM sc ORDER BY key_micro DESC, doc_id LIMIT $k""".stripMargin

      // Profile over a random lineitem column subset + slice.
      val pm = 1 + rnd.nextInt(3); val pr = rnd.nextInt(pm)
      val nCols = 3 + rnd.nextInt(3)
      val pcols = rnd.shuffle(liCols).take(nCols)
      val arms = pcols.map { case (c, cls) =>
        val head = s"SELECT '$c' AS \"column\", count($c) AS n_nonnull, " +
          s"count(*) - count($c) AS n_null, count(DISTINCT $c) AS n_distinct"
        val tail = cls match {
          case "num" =>
            s"CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str, " +
            s"CAST(min($c) AS DOUBLE) AS min_num, CAST(max($c) AS DOUBLE) AS max_num, " +
            s"CAST(sum(CAST($c AS DECIMAL(20,4))) AS DOUBLE) AS sum_num, CAST(NULL AS BIGINT) AS sum_len"
          case "str" =>
            s"min($c) AS min_str, max($c) AS max_str, CAST(NULL AS DOUBLE) AS min_num, " +
            s"CAST(NULL AS DOUBLE) AS max_num, CAST(NULL AS DOUBLE) AS sum_num, " +
            s"CAST(sum(len($c)) AS BIGINT) AS sum_len"
          case _ =>
            s"min(CAST($c AS VARCHAR)) AS min_str, max(CAST($c AS VARCHAR)) AS max_str, " +
            s"CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num, " +
            s"CAST(NULL AS DOUBLE) AS sum_num, CAST(NULL AS BIGINT) AS sum_len"
        }
        s"$head, $tail FROM read_parquet(${sqlStr(liParquet)}) WHERE l_orderkey % $pm = $pr"
      }
      val profSql = arms.mkString("\nUNION ALL\n")

      // globalOrder over a random subset × epoch.
      val om = 1 + rnd.nextInt(3); val or = rnd.nextInt(om)
      val epoch = rnd.nextInt(5)
      val ordSql =
        s"""SELECT doc_id,
           |  CAST(row_number() OVER (ORDER BY md5('$salt:e$epoch:' || CAST(doc_id AS VARCHAR)),
           |                          doc_id) - 1 AS BIGINT) AS pos
           |FROM read_parquet(${sqlStr(docsParquet)}) WHERE doc_id % $om = $or""".stripMargin

      // interleaveOrder over a random subset × weight formula (weights
      // constant per key: a function of the key's length band).
      val im = 1 + rnd.nextInt(3); val ir = rnd.nextInt(im)
      val iw = 1 + rnd.nextInt(5)
      val ilSql =
        s"""WITH d AS (SELECT doc_id, source,
           |    1 + (len(source) * $iw) % 7 AS w
           |  FROM read_parquet(${sqlStr(docsParquet)}) WHERE doc_id % $im = $ir),
           |r AS (SELECT doc_id, source, w, row_number() OVER (
           |    PARTITION BY source
           |    ORDER BY md5('il$salt:' || CAST(doc_id AS VARCHAR)), doc_id) AS mix_rank
           |  FROM d)
           |SELECT doc_id, source, CAST(mix_rank AS BIGINT) AS mix_rank,
           |  (CAST(mix_rank AS DOUBLE) - 0.5) / CAST(w AS DOUBLE) AS mix_key
           |FROM r""".stripMargin

      Seq(
        (s"il_$i", s"interleave m=$im/$ir iw=$iw", ilSql, () =>
          graft.operators.Sampling.interleaveOrder(
            graft.ops.Tables.documents(spark, sfDir)
              .where(pmod(col("doc_id"), lit(im)) === ir)
              .withColumn("w", lit(1L) + (length(col("source")) * iw) % 7),
            "source", "doc_id", "w", s"il$salt")
            .select(col("doc_id"), col("source"), col("mix_rank"), col("mix_key"))),
        (s"dsir_$i", s"dsir top-k b=$b k=$k m=$m/$r tgt=$tm/$tr", topSql, () =>
          graft.operators.Dsir.selectTopK(
            graft.operators.Dsir.score(sub, spark.read.parquet(fix),
              "doc_id", "text", b, salt), k)),
        (s"dsirres_$i", s"dsir resample b=$b k=$k m=$m/$r", resSql, () =>
          graft.operators.Dsir.resampleGumbel(
            graft.operators.Dsir.score(sub, spark.read.parquet(fix),
              "doc_id", "text", b, salt), "doc_id", k, s"g$salt")),
        (s"prof_$i", s"profile cols=${pcols.map(_._1).mkString(",")} m=$pm/$pr", profSql, () =>
          graft.operators.Profile.profile(
            graft.ops.Tables.load(spark, sfDir, "lineitem")
              .where(pmod(col("l_orderkey"), lit(pm)) === pr),
            pcols.map(_._1))),
        (s"ord_$i", s"globalOrder epoch=$epoch m=$om/$or", ordSql, () =>
          graft.operators.Sampling.globalOrder(
            graft.ops.Tables.documents(spark, sfDir)
              .where(pmod(col("doc_id"), lit(om)) === or),
            "doc_id", salt, epoch)))
    }
    val duck = DuckOracle.run(cases.map(c => c._1 -> c._3).toMap)
    val problems = DuckOracle.evalAll(cases, duck)
    assert(problems.isEmpty, s"seed=$Seed\n" + problems.mkString("\n\n"))
  }
}
