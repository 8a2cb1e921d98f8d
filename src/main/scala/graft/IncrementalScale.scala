package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Scale probe for incremental dedup ([[operators.Dedup.incrementalCandidates]]
 * / [[operators.Dedup.incrementalKeep]]), sibling of [[DedupScale]]: the
 * claim under test is that per-BATCH cost is independent of CORPUS size —
 * the production property that lets a 100 TB corpus grow by daily
 * increments without ever re-pairing itself. The corpus bucket index is
 * built once (timed separately, amortized across every future batch); the
 * timed increment is batch signature + bucket join + survivor fixpoint.
 * For contrast, `full_sec` times what the non-incremental pipeline would
 * redo at each increment: LSH candidates + components over corpus ∪ batch.
 *
 * Corpus text generation matches [[DedupScale]] (deterministic 40-token
 * docs, 1024-word vocab — unrelated docs share ~no shingles). Batch docs
 * (ids above the corpus range): one third exact-duplicate a corpus doc
 * (seed = id % n), one third duplicate their batch predecessor (chains —
 * exercising transitivity through the survivor components), one third are
 * unique.
 *
 * Args: corpus sizes (default 200000, 1000000); batch is
 * `GRAFT_BATCH` docs (default 20000) at every corpus size.
 */
object IncrementalScale {
  def main(args: Array[String]): Unit = {
    val sizeArgs = args.toSeq.filterNot(_ == "--fast")
    val sizes = if (sizeArgs.nonEmpty) sizeArgs.map(_.toLong)
                else Seq(200000L, 1000000L)
    val batchN = sys.env.getOrElse("GRAFT_BATCH", "20000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", ScaleDefaults.shuffleParts(cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val vocabSql = (0 until 1024).map(i => s"'w$i'").mkString(", ")
    def text(seedCol: String) =
      expr(s"concat_ws(' ', transform(sequence(1, 40), " +
        s"p -> element_at(array($vocabSql), " +
        s"CAST(pmod(hash($seedCol, p), 1024) + 1 AS INT))))").as("text")
    // GC before every timed stage (the Bench rule): a previous stage's
    // garbage — million-doc string frames — otherwise lands as a
    // multi-second pause inside the next stage's wall time.
    def timed[A](f: => A): (A, Double) = {
      System.gc()
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    // --fast: the xxhash64 family (the 100 TB configuration — see
    // minHashSignature's scaladoc); default stays md5 so recorded runs
    // remain comparable across rounds.
    val fastHash = args.contains("--fast")
    def buckets(df: org.apache.spark.sql.DataFrame) = operators.Dedup.lshBuckets(
      operators.Dedup.minHashSignature(
        operators.Dedup.charShingles(df, "doc_id", "text", 5), k = 8,
        fastHash = fastHash),
      k = 8, rowsPerBand = 4, fastHash = fastHash)

    def run(n: Long, bN: Long, warmup: Boolean): Unit = {
      val corpus = spark.range(n)
        .select(col("id").as("doc_id"), text("id"))
        .repartition(cpus * 2)
        .persist(StorageLevel.MEMORY_AND_DISK)
      corpus.count()
      // Batch thirds: corpus dup (seed = id % n — exact text of a corpus
      // doc), dup of the batch predecessor's corpus doc (same effective
      // seed — chains batch↔batch↔corpus through the survivor components),
      // unique (raw id seed, disjoint from every corpus seed).
      val batch = spark.range(n, n + bN)
        .select(col("id").as("doc_id"),
          expr(s"CASE WHEN id % 3 = 0 THEN id % $n " +
            s"WHEN id % 3 = 1 THEN (id - 1) % $n ELSE id END").as("__seed"))
        .select(col("doc_id"), text("__seed"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      batch.count()

      // Index build: once per corpus lifetime, not per batch. The per-
      // bucket counts are stored with it (the corpusCounts contract).
      val (ix, indexSec) = timed {
        val b = buckets(corpus).persist(StorageLevel.MEMORY_AND_DISK)
        val c = b.groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("n")).persist(StorageLevel.MEMORY_AND_DISK)
        c.count()
        (b, c)
      }
      val (index, counts) = ix
      // The increment: everything a new batch costs.
      val (nKept, incSec) = timed {
        val pairs = operators.Dedup.incrementalCandidates(index, buckets(batch),
          corpusCounts = Some(counts))
        operators.Dedup.incrementalKeep(batch, "doc_id", pairs,
          corpus.select(col("doc_id"))).count()
      }
      graft.util.Caches.drain()
      // What a full re-dedup of corpus ∪ batch would redo instead.
      val (nFullClusters, fullSec) = timed {
        val pairs = operators.Dedup.lshCandidates(buckets(corpus.union(batch)))
        operators.Dedup.components(pairs).select("label").distinct().count()
      }
      if (!warmup)
        println(f"""{"corpus": $n, "batch": $bN, "index_sec": $indexSec%.2f, """ +
          f""""inc_sec": $incSec%.2f, "kept": $nKept, """ +
          f""""full_sec": $fullSec%.2f, "full_clusters": $nFullClusters}""")
      Seq(corpus, batch, index, counts).foreach(_.unpersist(blocking = true))
      graft.util.Caches.drain()
      spark.catalog.clearCache()
    }

    run(50000L, 5000L, warmup = true) // JIT/codegen warmup — untimed
    sizes.foreach(n => run(n, batchN, warmup = false))
    spark.stop()
  }
}
