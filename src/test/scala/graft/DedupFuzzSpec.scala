package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Differential fuzzer for the dedup pipeline's PARAMETER SPACE. The battery
 * pins one configuration per operator (5-char shingles, k=8/4-row bands,
 * maxBucket=1000 — never binding at battery scale, 0.25 Jaccard, 32/64-bit
 * SimHash); this sweeps random configurations — shingle width × minhash
 * k/rowsPerBand × bucket caps SMALL ENOUGH TO BIND on real data × Jaccard
 * thresholds/df caps × SimHash bit widths incl. the sign bit × doc subsets
 * — each against a DuckDB oracle built from the same parameters by the
 * same mirror rules as the battery CTEs (PipelineQueries.scala): salted
 * md5 slices for minhash, hex-nibble bit extraction for simhash, capped
 * universes for Jaccard. Cases run sequentially (dedup operators retain
 * caches; Caches.drain between cases would race a concurrent evaluator).
 */
object DedupFuzzer {
  final case class Case(name: String, desc: String, sql: String,
                        spark: () => DataFrame)

  private def sqlStr(s: String) = "'" + s.replace("'", "''") + "'"

  private def baseCte(parquet: String, m: Int, r: Int) =
    s"""base AS (SELECT doc_id, text FROM read_parquet(${sqlStr(parquet)})
       |  WHERE doc_id % $m = $r)""".stripMargin

  private def shCte(n: Int) =
    s"""sh AS (SELECT DISTINCT doc_id, substr(text, i, $n) AS sh
       |       FROM base, generate_series(1, 4000) t(i)
       |       WHERE i <= greatest(len(text) - ${n - 1}, 1))""".stripMargin

  def genMinhash(i: Int, rnd: Random, parquet: String): Case = {
    val n = Seq(3, 5, 8)(rnd.nextInt(3))
    // A third of cases take their banding from the suggestBanding advisor
    // (random corpus size × target Jaccard) instead of the fixed list —
    // the advisor's output must flow through signature/banding/oracle
    // like any hand-picked (k, rpb).
    val advised = rnd.nextInt(3) == 0
    val (k, rpb) =
      if (advised) {
        val size = Seq(5000L, 100000L, 2000000L, 10000000L)(rnd.nextInt(4))
        val tj = Seq(0.9, 0.95, 0.97)(rnd.nextInt(3))
        graft.operators.Dedup.suggestBanding(size, tj)
      } else Seq((4, 2), (8, 4), (8, 2), (12, 4), (12, 3), (6, 3))(rnd.nextInt(6))
    val maxBucket = Seq(2, 5, 50, 1000)(rnd.nextInt(4))
    val (m, r) = { val mm = 1 + rnd.nextInt(3); (mm, rnd.nextInt(mm)) }
    val desc = s"minhash n=$n k=$k rpb=$rpb maxBucket=$maxBucket filter=$m/$r" +
      (if (advised) " (advisor bands)" else "")

    val mins = (0 until k).map(j =>
      s"min(substr(md5('${j / 4}:' || sh), ${1 + 8 * (j % 4)}, 8)) AS h$j").mkString(", ")
    val bands = (0 until k / rpb).map(b =>
      s"SELECT doc_id, $b AS band, md5(${(0 until rpb).map(x => s"h${b * rpb + x}").mkString(" || ")}) AS bkt FROM sig")
      .mkString(" UNION ALL ")
    val sql =
      s"""WITH ${baseCte(parquet, m, r)},
         |${shCte(n)},
         |sig AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
         |b AS ($bands),
         |bc AS (SELECT band, bkt, count(*) AS cnt FROM b GROUP BY band, bkt),
         |bt AS (SELECT b.* FROM b JOIN bc USING (band, bkt) WHERE bc.cnt <= $maxBucket)
         |SELECT DISTINCT a.doc_id AS d1, b2.doc_id AS d2
         |FROM bt a JOIN bt b2
         |  ON a.band = b2.band AND a.bkt = b2.bkt AND a.doc_id < b2.doc_id""".stripMargin

    Case(s"mh_$i", desc, sql, () => {
      val s = SparkSpec.spark
      val d = graft.ops.Tables.documents(s, new java.io.File(parquet).getParent)
        .where(col("doc_id") % m === r)
      graft.operators.Dedup.lshCandidates(
        graft.operators.Dedup.lshBuckets(
          graft.operators.Dedup.minHashSignature(
            graft.operators.Dedup.charShingles(d, "doc_id", "text", n), k),
          k, rpb),
        maxBucket)
    })
  }

  def genJaccard(i: Int, rnd: Random, parquet: String): Case = {
    val n = Seq(3, 5, 8)(rnd.nextInt(3))
    val threshold = Seq(0.05, 0.25, 0.6)(rnd.nextInt(3))
    val maxDf = Seq(3, 20, 1 << 29)(rnd.nextInt(3))
    val (m, r) = { val mm = 1 + rnd.nextInt(3); (mm, rnd.nextInt(mm)) }
    val desc = s"jaccard n=$n t=$threshold maxDf=$maxDf filter=$m/$r"
    val sql =
      s"""WITH ${baseCte(parquet, m, r)},
         |${shCte(n)},
         |dfc AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= $maxDf),
         |rare AS (SELECT s.doc_id, s.sh FROM sh s JOIN dfc USING (sh)),
         |sz AS (SELECT doc_id, count(*) AS sn FROM rare GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
         |          FROM rare a JOIN rare b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |          GROUP BY a.doc_id, b.doc_id)
         |SELECT d1, d2, CAST(i AS DOUBLE) / (x.sn + y.sn - i) AS jac
         |FROM inter JOIN sz x ON d1 = x.doc_id JOIN sz y ON d2 = y.doc_id
         |WHERE CAST(i AS DOUBLE) / (x.sn + y.sn - i) >= $threshold""".stripMargin

    Case(s"jac_$i", desc, sql, () => {
      val s = SparkSpec.spark
      val d = graft.ops.Tables.documents(s, new java.io.File(parquet).getParent)
        .where(col("doc_id") % m === r)
      graft.operators.Dedup.jaccardPairs(
        graft.operators.Dedup.charShingles(d, "doc_id", "text", n),
        threshold, maxDf)
    })
  }

  /** Boilerplate strip under random unit widths × df thresholds × doc
    * subsets: token spans of width w as units (w=1 ≡ the lines() split on
    * ' '), strip units whose distinct-doc frequency >= minDf, rebuild.
    * Mirrors the dd_strip_boilerplate battery CTE parameterized. */
  def genStrip(i: Int, rnd: Random, parquet: String): Case = {
    val w = Seq(1, 2, 8, 16)(rnd.nextInt(4))
    val minDf = Seq(2L, 3L, 5L, 400L)(rnd.nextInt(4))
    val (m, r) = { val mm = 1 + rnd.nextInt(3); (mm, rnd.nextInt(mm)) }
    val desc = s"strip w=$w minDf=$minDf filter=$m/$r"
    val sql =
      s"""WITH ${baseCte(parquet, m, r)},
         |toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM base),
         |nc AS (SELECT doc_id, tk, greatest(1, CAST(ceil(len(tk) / $w.0) AS BIGINT)) AS n FROM toks),
         |ch AS (SELECT doc_id, i AS unit_idx,
         |         array_to_string(list_slice(tk, i*$w + 1, i*$w + $w), ' ') AS unit
         |       FROM nc JOIN generate_series(0, 4000) s(i) ON s.i < nc.n),
         |df AS (SELECT md5(unit) AS h, count(DISTINCT doc_id) AS df FROM ch GROUP BY 1),
         |j AS (SELECT ch.doc_id, ch.unit_idx, ch.unit, df.df
         |      FROM ch JOIN df ON md5(ch.unit) = df.h)
         |SELECT doc_id, count(*) AS n_units,
         |  CAST(sum(CASE WHEN df < $minDf THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  coalesce(string_agg(CASE WHEN df < $minDf THEN unit END, ' ' ORDER BY unit_idx), '') AS clean_text
         |FROM j GROUP BY doc_id""".stripMargin

    // w=1 chunks are exactly the split-on-space unit form, so half those
    // cases go through the broadcast fast path instead — same oracle.
    val useFast = w == 1 && rnd.nextBoolean()
    Case(s"strip_$i", desc + (if (useFast) " (fast path)" else ""), sql, () => {
      val s = SparkSpec.spark
      val d = graft.ops.Tables.documents(s, new java.io.File(parquet).getParent)
        .where(col("doc_id") % m === r)
      if (useFast)
        graft.operators.Dedup.stripBoilerplateFast(d, "doc_id", "text",
          minDf = minDf, sep = " ")
      else
        graft.operators.Dedup.stripBoilerplateUnits(
          graft.operators.TextAnalysis.chunks(d, "doc_id", "text", chunkSize = w, overlap = 0)
            .select(col("doc_id"), col("chunk_idx").as("unit_idx"), col("chunk").as("unit")),
          minDf = minDf, joinSep = " ")
    })
  }

  def genSimhash(i: Int, rnd: Random, parquet: String): Case = {
    val nBits = Seq(8, 16, 32, 64)(rnd.nextInt(4))
    val maxHam = Seq(0, 1, 3)(rnd.nextInt(3))
    val (m, r) = { val mm = 1 + rnd.nextInt(3); (mm, rnd.nextInt(mm)) }
    val desc = s"simhash nBits=$nBits maxHam=$maxHam filter=$m/$r"
    val sql =
      s"""WITH ${baseCte(parquet, m, r)},
         |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM base),
         |bits AS (SELECT doc_id, md5(tok) AS h, p FROM toks, generate_series(0, ${nBits - 1}) t(p)),
         |c AS (SELECT doc_id, p,
         |        sum((((strpos('0123456789abcdef', substr(h, (p // 4) + 1, 1)) - 1)
         |              >> (3 - (p % 4))) & 1) * 2 - 1) AS s
         |      FROM bits GROUP BY doc_id, p),
         |fps AS (SELECT doc_id,
         |          CAST(sum(CASE WHEN s <= 0 THEN 0
         |                        WHEN p = 63 THEN (-9223372036854775808)::BIGINT
         |                        ELSE (CAST(1 AS BIGINT) << p) END) AS BIGINT) AS fp
         |        FROM c GROUP BY doc_id)
         |SELECT a.doc_id AS d1, b.doc_id AS d2,
         |       CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS ham
         |FROM fps a JOIN fps b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.fp, b.fp)) <= $maxHam""".stripMargin

    Case(s"sim_$i", desc, sql, () => {
      val s = SparkSpec.spark
      val d = graft.ops.Tables.documents(s, new java.io.File(parquet).getParent)
        .where(col("doc_id") % m === r)
      graft.operators.Dedup.simHashPairs(
        graft.operators.Dedup.simHash(d, "doc_id", "text", nBits), maxHam, nBits)
    })
  }
}

object AnnFuzzer {
  import DedupFuzzer.Case

  private def sqlStr(s: String) = "'" + s.replace("'", "''") + "'"

  /** Exact cosine top-k oracle SQL over a (possibly subsetted) corpus
    * with queries = corpus rows where vec_id % qm = qr. */
  private def bruteSql(parquet: String, k: Int, qm: Int, qr: Int,
                       cm: Int, cr: Int): String = {
    val corpusW = if (cm == 1) "" else s" WHERE vec_id % $cm = $cr"
    val sql =
      s"""WITH emb AS (SELECT vec_id, embedding FROM read_parquet(${sqlStr(parquet)})$corpusW),
         |idx AS (SELECT i FROM generate_series(1, 64) t(i)),
         |u AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v FROM emb, idx),
         |nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS n FROM u GROUP BY vec_id),
         |q AS (SELECT vec_id AS qid, i, v FROM u WHERE vec_id % $qm = $qr),
         |dot AS (SELECT q.qid, u.vec_id AS nid, sum(q.v * u.v) AS d
         |        FROM q JOIN u ON q.i = u.i AND q.qid <> u.vec_id
         |        GROUP BY q.qid, u.vec_id),
         |scored AS (SELECT qid, nid, d / (x.n * y.n) AS cos
         |           FROM dot JOIN nrm x ON qid = x.vec_id JOIN nrm y ON nid = y.vec_id),
         |ranked AS (SELECT qid, nid,
         |             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank
         |           FROM scored)
         |SELECT qid AS query_id, nid AS neighbor_id, CAST(rank AS BIGINT) AS rank
         |FROM ranked WHERE rank <= $k""".stripMargin
    sql
  }

  /** Brute-force cosine top-k under random k × query sets × corpus
    * subsets. Pairwise cosines are fixed by the vectors, so subsetting
    * only removes candidates — the ranking stability the battery's
    * single-config row establishes carries over to every configuration. */
  def genAnn(i: Int, rnd: Random, parquet: String): Case = {
    val k = Seq(1, 3, 10)(rnd.nextInt(3))
    val (qm, qr) = { val m = 5 + rnd.nextInt(20); (m, rnd.nextInt(m)) }
    val (cm, cr) = if (rnd.nextBoolean()) { val m = 2 + rnd.nextInt(2); (m, rnd.nextInt(m)) }
                   else (1, 0)
    val desc = s"ann k=$k queries=$qm/$qr corpus=$cm/$cr"
    val sql = bruteSql(parquet, k, qm, qr, cm, cr)

    Case(s"ann_$i", desc, sql, () => {
      val s = SparkSpec.spark
      val e0 = graft.ops.Tables.embeddings(s, new java.io.File(parquet).getParent)
      val corpus = if (cm == 1) e0 else e0.where(col("vec_id") % cm === cr)
      val queries = corpus.where(col("vec_id") % qm === qr)
      graft.operators.Ann.bruteForceTopK(corpus, queries, "vec_id", "embedding", k)
        .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
    })
  }

  /** IVFADC at the exactness limit: probing EVERY cell with a shortlist
    * wider than the corpus makes the exact re-rank see all candidates, so
    * the result must equal brute force row-for-row REGARDLESS of the IVF/
    * PQ parameters — random cells × subspaces × code counts × iteration
    * budgets × query/corpus subsets all reduce to the same brute-force
    * DuckDB oracle. A wrong residual sign, a query routed to a cell its
    * codes weren't stored under, a LUT indexed off-by-one: each would
    * surface as a shortlist that drops a true neighbor and diverges. The
    * approximate regime's quality is gated separately (ann_ivfpq_recall);
    * this family pins the MACHINERY exactly. */
  def genIvfPq(i: Int, rnd: Random, parquet: String): Case = {
    val k = Seq(1, 3, 10)(rnd.nextInt(3))
    val (qm, qr) = { val m = 5 + rnd.nextInt(20); (m, rnd.nextInt(m)) }
    val (cm, cr) = if (rnd.nextBoolean()) { val m = 2 + rnd.nextInt(2); (m, rnd.nextInt(m)) }
                   else (1, 0)
    val nCells = Seq(2, 3, 4, 8)(rnd.nextInt(4))
    val nSub = Seq(4, 8, 16)(rnd.nextInt(3))
    val nCodes = Seq(4, 8, 16)(rnd.nextInt(3))
    val ivfIters = 1 + rnd.nextInt(2)
    val pqIters = 1 + rnd.nextInt(2)
    // corpus is ≤500 vectors at any SF subset; k·rerank ≥ 500 ⇒ no slack
    val rerank = 500 / k + 1
    val desc = s"ivfpq k=$k cells=$nCells sub=$nSub codes=$nCodes " +
      s"iters=$ivfIters/$pqIters queries=$qm/$qr corpus=$cm/$cr"
    val sql = bruteSql(parquet, k, qm, qr, cm, cr)

    Case(s"ivfpq_$i", desc, sql, () => {
      val s = SparkSpec.spark
      val e0 = graft.ops.Tables.embeddings(s, new java.io.File(parquet).getParent)
      val corpus = if (cm == 1) e0 else e0.where(col("vec_id") % cm === cr)
      val queries = corpus.where(col("vec_id") % qm === qr)
      graft.operators.Ann.ivfPqTopK(corpus, queries, "vec_id", "embedding",
          dim = 64, nCells = nCells, ivfIters = ivfIters, nSub = nSub,
          nCodes = nCodes, pqIters = pqIters, k = k,
          nProbes = nCells, rerank = rerank)
        .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
    })
  }
}

class DedupFuzzSpec extends SparkSpec {
  import DedupFuzzer._

  private val sfDir = sys.env.getOrElse("GRAFT_FUZZ_SF", "/root/testdata/sf0.001")
  private val N = sys.env.get("GRAFT_FUZZ_N").map(_.toInt).getOrElse(10)
  private val Seed = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(FuzzRound.seed)

  test(s"$N×4 fuzzed dedup + ${N / 2}×2 ANN/IVFADC parameterizations match DuckDB oracles") {
    assume(DuckOracle.available, "python3 + duckdb unavailable — differential fuzz skipped")
    val parquet = s"$sfDir/documents.parquet"
    val embParquet = s"$sfDir/embeddings.parquet"
    assume(new java.io.File(parquet).exists(), s"$parquet missing")

    val rnd = new Random(Seed)
    val cases =
      (0 until N).map(i => genMinhash(i, rnd, parquet)) ++
        (0 until N).map(i => genJaccard(i, rnd, parquet)) ++
        (0 until N).map(i => genSimhash(i, rnd, parquet)) ++
        (0 until N).map(i => genStrip(i, rnd, parquet)) ++
        (0 until N / 2).map(i => AnnFuzzer.genAnn(i, rnd, embParquet)) ++
        (0 until N / 2).map(i => AnnFuzzer.genIvfPq(i, rnd, embParquet))

    val duck = DuckOracle.run(cases.map(c => c.name -> c.sql).toMap)
    // Sequential on purpose: dedup operators retain caches and the drain
    // below is global.
    val failures = cases.flatMap { c =>
      val f = DuckOracle.check(c.name, c.desc, c.sql, c.spark(), duck)
      graft.util.Caches.drain()
      f
    }
    assert(failures.isEmpty,
      s"${failures.size} of ${cases.size} fuzzed dedup configs diverged (seed=$Seed):\n\n" +
        failures.take(8).mkString("\n\n"))
  }
}
