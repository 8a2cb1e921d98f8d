package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for large-scale training-data pipelines: exact
 * (hash-groupBy), MinHash+LSH, SimHash, and n-gram Jaccard.
 *
 * All hashing is md5-based so results are engine-independent (the same
 * pipeline expressed in any SQL engine with md5() yields identical buckets
 * and signatures — the DuckDB oracles in [[graft.ops.PipelineQueries]] rely
 * on this). MinHash uses the *lexicographic* min of salted md5 hex digests,
 * avoiding any hex→int conversion that differs across engines.
 *
 * Scale notes: every stage is shuffle-by-key (doc id or bucket) with
 * map-side partial aggregation; nothing is collected to the driver. The LSH
 * candidate join keys on (band, bucket) — at 100 TB the bucket distribution
 * is the skew risk, so `lshCandidates` caps per-bucket size via a count
 * filter (a bucket holding half the corpus is a degenerate hash, not signal).
 */
object Dedup {

  /** Exact dedup: one row per distinct `textCol` value, keeping the smallest
    * id as canonical plus the duplicate count. A plain hash aggregation —
    * Spark's partial/final agg makes this a single shuffle of (hash, id). */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))

  /** Distinct character n-gram shingles per document: (id, sh). Generated
    * with a codegen'd array expression (no UDF), then exploded. */
  def charShingles(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(
      col(idCol).as("id"),
      explode(expr(
        s"array_distinct(transform(sequence(1, greatest(length($textCol)-${n - 1}, 1)), " +
        s"i -> substring($textCol, i, $n)))")).as("sh"))

  /** MinHash signature with k hash functions: column h0..h{k-1}, where
    * h_i = min over shingles of an 8-hex-char (32-bit) slice of a salted
    * md5 (lexicographic). One md5 yields four independent 32-bit hashes, so
    * only ceil(k/4) digests are computed per shingle — md5 dominates the
    * signature cost at corpus scale. */
  def minHashSignature(shingles: DataFrame, k: Int): DataFrame = {
    val nDigests = (k + 3) / 4
    val withDigests = (0 until nDigests).foldLeft(shingles) { (df, d) =>
      df.withColumn(s"__m$d", md5(concat(lit(s"$d:"), col("sh"))))
    }
    val aggs = (0 until k).map { i =>
      min(substring(col(s"__m${i / 4}"), 1 + 8 * (i % 4), 8)).as(s"h$i")
    }
    withDigests.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: signature → (id, band, bucket) with bands of `rowsPerBand`
    * hashes; bucket = md5 of the concatenated band slice. */
  def lshBuckets(signature: DataFrame, k: Int, rowsPerBand: Int): DataFrame = {
    require(k % rowsPerBand == 0, "k must divide into equal bands")
    val bands = (0 until k / rowsPerBand).map { b =>
      val slice = (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), md5(concat(slice: _*)).as("bucket"))
    }
    signature.select(col("id"), explode(array(bands: _*)).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bucket"))
  }

  /** Candidate near-dup pairs: ids sharing any (band, bucket), id1 < id2,
    * distinct. `maxBucket` drops degenerate buckets (skew guard at scale). */
  def lshCandidates(buckets: DataFrame, maxBucket: Int = 1000): DataFrame = {
    // The bucket table is tiny (one row per doc per band) but its lineage —
    // shingle explode + signature aggregation — is the expensive part of the
    // whole pipeline. Persist it so the self-join's two sides don't each
    // recompute the upstream (measured 2x on the driver battery).
    val trimmed = buckets
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bucket"))))
      .filter(col("__n") <= maxBucket)
      .drop("__n")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = trimmed.select(col("id").as("d1"), col("band"), col("bucket"))
    val b = trimmed.select(col("id").as("d2"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket"))
      .where(col("d1") < col("d2"))
      .select(col("d1"), col("d2")).distinct()
  }

  /** Exact n-gram Jaccard similarity for all pairs with J >= `threshold`.
    * Pairs arise only from shared shingles (inverted-index join), so the
    * quadratic blow-up is bounded by shingle co-occurrence, not corpus size.
    * Output: (d1, d2, jac). */
  def jaccardPairs(shingles: DataFrame, threshold: Double): DataFrame = {
    val sizes = shingles.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val a = shingles.select(col("id").as("d1"), col("sh"))
    val b = shingles.select(col("id").as("d2"), col("sh"))
    val inter = a.join(b, "sh").where(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("i"))
    inter
      .join(sizes.select(col("id").as("d1"), col("n").as("na")), "d1")
      .join(sizes.select(col("id").as("d2"), col("n").as("nb")), "d2")
      .withColumn("jac", col("i").cast("double") / (col("na") + col("nb") - col("i")))
      .where(col("jac") >= threshold)
      .select(col("d1"), col("d2"), col("jac"))
  }

  /** 32-bit SimHash over whitespace tokens: per bit p, sum (+1/-1) of bit p
    * of md5(token) across tokens; fingerprint sets bit p iff the sum is
    * positive. Pure codegen'd expressions (instr/shiftright on hex chars). */
  def simHash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(split(col(textCol), " ")).as("tok"))
    val bits = toks
      .select(col("id"), md5(col("tok")).as("h"),
        explode(expr("sequence(0, 31)")).as("p"))
      .withColumn("contrib", expr(
        "(shiftright(instr('0123456789abcdef', substring(h, (p div 4) + 1, 1)) - 1, " +
        "3 - (p % 4)) & 1) * 2 - 1"))
    bits.groupBy(col("id"), col("p")).agg(sum(col("contrib")).as("s"))
      .groupBy(col("id"))
      .agg(sum(when(col("s") > 0, expr("shiftleft(CAST(1 AS BIGINT), p)"))
        .otherwise(0L)).as("fp"))
  }

  /** Near-dup pairs by SimHash Hamming distance <= `maxHamming`. */
  def simHashPairs(fps: DataFrame, maxHamming: Int): DataFrame = {
    val a = fps.select(col("id").as("d1"), col("fp").as("fa"))
    val b = fps.select(col("id").as("d2"), col("fp").as("fb"))
    a.crossJoin(b).where(col("d1") < col("d2"))
      .withColumn("ham", expr("bit_count(fa ^ fb)"))
      .where(col("ham") <= maxHamming)
      .select(col("d1"), col("d2"), col("ham"))
  }

  /** Embedding cosine near-dup pairs (cos >= threshold). Dot products run as
    * a single codegen'd zip_with/aggregate expression over the float arrays.
    * Brute-force O(n^2) — the scale path is [[Ann.signLshBuckets]] first. */
  def embeddingNearDups(emb: DataFrame, idCol: String, vecCol: String,
                        threshold: Double): DataFrame = {
    graft.functions.VectorFunctions.register(emb.sparkSession)
    val e = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", expr("vec_norm(v)"))
    val a = e.select(col("id").as("v1"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("id").as("v2"), col("v").as("vb"), col("nrm").as("nb"))
    a.crossJoin(b).where(col("v1") < col("v2"))
      .withColumn("dot", expr("vec_dot(va, vb)"))
      .where(col("dot") / (col("na") * col("nb")) >= threshold)
      .select(col("v1"), col("v2"))
  }
}
