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
 *  - scrubSpans: the covered-position set and byte-exact rebuild across
 *    window widths n ∈ {2..13} × random eval/corpus splits — the widths
 *    where off-by-one window or coverage arithmetic would diverge.
 *  - Profile.drift: the delta/ppm/range arithmetic over random
 *    before/after slice pairs vs a two-stack mirror.
 *
 * Mirror-verification: the oracles were checked against deliberately
 * broken variants during development (dsir scoring mirror pointed at a
 * wrong-salt bucket hash → MISMATCH on every dsir/resample case;
 * globalOrder mirror with the epoch dropped from the salt → MISMATCH on
 * every order case; interleave mirror ranking by a wrong-salt md5 line →
 * MISMATCH on every interleave case; scrub mirror covering one position
 * short per window → MISMATCH on every scrub case; drift ppm mirror with
 * a perturbed scale constant → MISMATCH once NULLIF injects real nulls —
 * which is WHY the drift case nulls out a flag value: on the null-free
 * raw table the ppm arithmetic is unfalsifiable) — agreement is not
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

      // scrubSpans over a random window width × eval/corpus split.
      val sn = Seq(2, 3, 5, 8, 13)(rnd.nextInt(5))
      val em = 7 + rnd.nextInt(13); val er = rnd.nextInt(em)
      val scrubSql =
        s"""WITH ct AS (SELECT doc_id, string_split(text, ' ') AS ts
           |           FROM read_parquet(${sqlStr(docsParquet)}) WHERE doc_id % $em <> $er),
           |ev AS (SELECT DISTINCT md5(array_to_string(ts[i : i+${sn - 1}], ' ')) AS gh
           |       FROM (SELECT string_split(text, ' ') AS ts
           |             FROM read_parquet(${sqlStr(docsParquet)}) WHERE doc_id % $em = $er) e,
           |            generate_series(1, 4000) s(i)
           |       WHERE i <= len(ts) - ${sn - 1}),
           |st AS (SELECT doc_id, i AS s FROM ct, generate_series(1, 4000) q(i)
           |       WHERE i <= len(ts) - ${sn - 1}
           |         AND md5(array_to_string(ts[i : i+${sn - 1}], ' ')) IN (SELECT gh FROM ev)),
           |cov AS (SELECT DISTINCT doc_id, s + j AS p
           |        FROM st, generate_series(0, ${sn - 1}) r(j)),
           |tok AS (SELECT doc_id, i AS p, ts[i] AS tok
           |        FROM ct, generate_series(1, 4000) u(i) WHERE i <= len(ts)),
           |kept AS (SELECT t.doc_id, t.p, t.tok FROM tok t
           |         LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.p = c.p
           |         WHERE c.p IS NULL)
           |SELECT ct.doc_id, CAST(len(ct.ts) AS BIGINT) AS n_tokens,
           |  CAST(len(ct.ts) - count(k.p) AS BIGINT) AS n_removed,
           |  coalesce(string_agg(k.tok, ' ' ORDER BY k.p), '') AS clean_text
           |FROM ct LEFT JOIN kept k USING (doc_id)
           |GROUP BY ct.doc_id, len(ct.ts)""".stripMargin

      // Profile.drift over a random before/after slice pair (numeric +
      // string + cast columns fixed — the arithmetic is what varies).
      val dm = 2 + rnd.nextInt(3); val dr = rnd.nextInt(dm)
      val dArms = Seq("l_orderkey" -> "num", "l_quantity" -> "num",
        "l_returnflag" -> "str", "l_shipdate" -> "cast")
      def dStack(filter: String): String = dArms.map { case (c, cls) =>
        val mm = cls match {
          case "num" => s"CAST(min($c) AS DOUBLE) AS mn_num, CAST(max($c) AS DOUBLE) AS mx_num, " +
            "CAST(NULL AS VARCHAR) AS mn_str, CAST(NULL AS VARCHAR) AS mx_str"
          case "str" => s"CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), min($c), max($c)"
          case _ => s"CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), " +
            s"min(CAST($c AS VARCHAR)), max(CAST($c AS VARCHAR))"
        }
        s"SELECT '$c' AS c, count(*) AS rows_, count(*) - count($c) AS nulls_, " +
          s"count(DISTINCT $c) AS nd, $mm FROM (SELECT * REPLACE " +
          s"(NULLIF(l_returnflag, 'R') AS l_returnflag) " +
          s"FROM read_parquet(${sqlStr(liParquet)})) $filter"
      }.mkString("\nUNION ALL\n")
      val ppmA = "CASE WHEN a.rows_ > 0 THEN CAST(floor(CAST(a.nulls_ AS DOUBLE) " +
        "* 1000000.0 / CAST(a.rows_ AS DOUBLE)) AS BIGINT) ELSE 0 END"
      val ppmB = "CASE WHEN b.rows_ > 0 THEN CAST(floor(CAST(b.nulls_ AS DOUBLE) " +
        "* 1000000.0 / CAST(b.rows_ AS DOUBLE)) AS BIGINT) ELSE 0 END"
      val driftSql =
        s"""WITH b AS (${dStack("")}),
           |a AS (${dStack(s"WHERE l_orderkey % $dm = $dr")})
           |SELECT b.c AS "column", b.rows_ AS b_rows, a.rows_ AS a_rows,
           |  a.rows_ - b.rows_ AS d_rows,
           |  b.nd AS b_distinct, a.nd AS a_distinct, a.nd - b.nd AS d_distinct,
           |  ($ppmA) - ($ppmB) AS d_null_ppm,
           |  CAST(coalesce(a.mn_num <> b.mn_num, false)
           |    OR coalesce(a.mx_num <> b.mx_num, false)
           |    OR coalesce(a.mn_str <> b.mn_str, false)
           |    OR coalesce(a.mx_str <> b.mx_str, false) AS BIGINT) AS range_moved
           |FROM b JOIN a ON b.c = a.c""".stripMargin

      Seq(
        (s"scrub_$i", s"scrubSpans n=$sn em=$em/$er", scrubSql, () =>
          graft.operators.TextAnalysis.scrubSpans(
            graft.ops.Tables.documents(spark, sfDir)
              .where(pmod(col("doc_id"), lit(em)) =!= er),
            graft.ops.Tables.documents(spark, sfDir)
              .where(pmod(col("doc_id"), lit(em)) === er),
            "doc_id", "text", sn)),
        (s"drift_$i", s"profile drift dm=$dm/$dr", driftSql, () => {
          // NULLIF injects real nulls so the ppm arithmetic is falsifiable
          // (lineitem itself is null-free; without this a broken ppm
          // mirror cannot be detected).
          val li = graft.ops.Tables.load(spark, sfDir, "lineitem")
            .withColumn("l_returnflag", expr("nullif(l_returnflag, 'R')"))
          graft.operators.Profile.drift(li,
            li.where(pmod(col("l_orderkey"), lit(dm)) === dr),
            dArms.map(_._1))
        }),
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
