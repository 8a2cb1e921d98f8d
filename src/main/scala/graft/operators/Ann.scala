package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (Array[Float]). Two paths:
 *
 *  - [[bruteForceTopK]]: exact cosine top-k. The (small) query set is
 *    broadcast against the corpus, the dot product is one codegen'd
 *    zip_with/aggregate expression, and per-query top-k is a rank window
 *    partitioned by query — no driver-side collection anywhere. At 100 TB
 *    this scales linearly in |corpus| × |queries| and is the right tool for
 *    few queries; for many queries use the LSH path.
 *
 *  - [[signLshBuckets]] + [[lshTopK]]: random-hyperplane sign LSH. The
 *    hyperplanes are derived deterministically from md5 (seedable, no RNG at
 *    plan time), embedded as literal arrays, so bucketing is a pure
 *    expression. Neighbor search then joins only within a bucket —
 *    sub-linear work at the cost of recall (multi-probe: `nBits` controls
 *    the bucket granularity).
 */
object Ann {

  private def cosineCols(corpus: DataFrame, idCol: String, vecCol: String) = {
    graft.functions.VectorFunctions.register(corpus.sparkSession)
    corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"))
      .withColumn("nn", expr("vec_norm(nv)"))
  }

  /** Exact cosine top-k for each query vector. Output: (query_id,
    * neighbor_id, rank). Self-matches excluded. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    graft.functions.VectorFunctions.register(corpus.sparkSession)
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .withColumn("qn", expr("vec_norm(qv)"))
    val n = cosineCols(corpus, idCol, vecCol)
    val scored = n.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("cos", expr("vec_dot(qv, nv)") / (col("qn") * col("nn")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(desc("cos"), asc("nid"))))
      .where(col("rank") <= k)
      .select(col("qid").as("query_id"), col("nid").as("neighbor_id"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component in [-7.5, 7.5]:
    * first hex digit of md5("seed:bit:dim") minus 7.5. */
  private def planeWeight(seed: Int, bit: Int, dim: Int): Double = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s"$seed:$bit:$dim".getBytes(StandardCharsets.UTF_8))
    ((d(0) >> 4) & 0xf) - 7.5
  }

  /** Deterministic integer hyperplane component in [-8, 7]: high nibble of
    * the first md5 byte of "seed:bit:dim", minus 8. Integer weights (paired
    * with the quantized [[graft.functions.FloatVecQDot vec_qdot]]) make the
    * bucket-bit sign exact — no float-summation-order ambiguity across
    * engines, which matters because an oracle re-deriving the buckets must
    * agree bit-for-bit. */
  private[graft] def qPlaneWeight(seed: Int, bit: Int, dim: Int): Int = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s"$seed:$bit:$dim".getBytes(StandardCharsets.UTF_8))
    ((d(0) >> 4) & 0xf) - 8
  }

  /** Multi-table quantized sign-LSH: `nTables` independent `nBits`-bit
    * bucket assignments per vector (table t uses seed 1000+t). Output:
    * (id, tbl, bucket). OR-amplification across tables raises recall for a
    * candidate join (a pair is a candidate if it shares a bucket in ANY
    * table); each table's join is a plain equi-join on (tbl, bucket), so
    * candidate generation is shuffle-by-key — sub-quadratic at scale.
    * Buckets are all-integer (vec_qdot of floor(v*1024) against int
    * hyperplanes), hence engine-exact. */
  def multiTableQBuckets(emb: DataFrame, idCol: String, vecCol: String,
                         dim: Int, nBits: Int, nTables: Int): DataFrame = {
    graft.functions.VectorFunctions.register(emb.sparkSession)
    val tables = (0 until nTables).map { t =>
      val bucket = (0 until nBits).map { b =>
        val w = (0 until dim).map(i => qPlaneWeight(1000 + t, b, i))
        when(expr(s"vec_qdot($vecCol, array(${w.mkString(", ")}))") > 0,
          lit(1L << b)).otherwise(0L)
      }.reduce(_ + _)
      struct(lit(t).as("tbl"), bucket.as("bucket"))
    }
    emb.select(col(idCol).as("id"), explode(array(tables: _*)).as("tb"))
      .select(col("id"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
  }

  /** Expression computing the `nBits`-bit sign-LSH bucket of `vecCol`. */
  private def bucketCol(vecCol: String, dim: Int, nBits: Int,
                        seed: Int): org.apache.spark.sql.Column =
    (0 until nBits).map { b =>
      val w = (0 until dim).map(i => planeWeight(seed, b, i))
      val warr = w.mkString("array(", "D, ", "D)")
      when(expr(s"vec_dot($vecCol, CAST($warr AS ARRAY<FLOAT>))") > 0,
        1L << b).otherwise(0L)
    }.reduce(_ + _)

  /** Add an LSH bucket column: `nBits` sign bits of dot(v, hyperplane_b). */
  def signLshBuckets(emb: DataFrame, idCol: String, vecCol: String,
                     dim: Int, nBits: Int, seed: Int = 42): DataFrame = {
    graft.functions.VectorFunctions.register(emb.sparkSession)
    emb.withColumn("bucket", bucketCol(vecCol, dim, nBits, seed))
  }

  /** Per-bucket centroid sufficient statistics over a quantized sign-LSH
    * partition of the corpus: (bucket, pos, qsum, n) with qsum =
    * Σ floor(v[pos]·1024) over the bucket's vectors — the centroid is
    * qsum/n/1024. All-integer outputs, so a re-derivation in any engine is
    * bit-exact (same property [[multiTableQBuckets]] relies on). One
    * shuffle by (bucket, pos) with map-side partials; the embedding
    * aggregation shape IVF coarse-quantizer training uses at scale. */
  def bucketCentroids(emb: DataFrame, idCol: String, vecCol: String,
                      dim: Int, nBits: Int): DataFrame = {
    val bk = multiTableQBuckets(emb, idCol, vecCol, dim, nBits, nTables = 1)
      .select(col("id"), col("bucket"))
    emb.select(col(idCol).as("id"), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .join(bk, "id")
      .groupBy(col("bucket"), col("pos"))
      .agg(sum(expr("CAST(floor(CAST(v AS DOUBLE) * 1024) AS BIGINT)")).as("qsum"),
        count(lit(1)).as("n"))
  }

  /** Sorted (distance, cell) structs for the `nProbes` nearest centroids of
    * the vector in `vecCol` — squared euclidean = ||v||² - 2·v·c + ||c||²,
    * computed with the codegen'd vec expressions, ties to lowest cell id. */
  private[graft] def probeCellsCol(vecCol: String, centroids: Array[Array[Double]],
                            nProbes: Int): org.apache.spark.sql.Column = {
    val dists = centroids.zipWithIndex.map { case (c, i) =>
      val carr = c.mkString("array(", "D, ", "D)")
      val cn = c.map(x => x * x).sum
      struct(
        (expr(s"vec_norm($vecCol)") * expr(s"vec_norm($vecCol)") -
          lit(2.0) * expr(s"vec_dot($vecCol, CAST($carr AS ARRAY<FLOAT>))") + lit(cn)).as("d"),
        lit(i).as("cell"))
    }
    slice(array_sort(array(dists: _*)), 1, nProbes)
  }

  /** IVF (inverted-file) cell assignment: Lloyd's k-means over the corpus,
    * deterministically initialized from the lowest-id vectors. Centroids
    * live driver-side (nCells × dim doubles — the standard k-means shape,
    * cf. MLlib); assignment and per-cell averaging are distributed. Returns
    * the corpus with a `cell` column plus the final centroids. */
  def ivfAssign(corpus: DataFrame, idCol: String, vecCol: String,
                dim: Int, nCells: Int, iters: Int): (DataFrame, Array[Array[Double]]) = {
    val spark = corpus.sparkSession
    graft.functions.VectorFunctions.register(spark)
    var centroids: Array[Array[Double]] = corpus
      .orderBy(col(idCol)).limit(nCells)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)

    def assignCol: org.apache.spark.sql.Column =
      probeCellsCol("__v", centroids, 1).getItem(0).getField("cell")

    // The iteration loop scans `base` once per iteration plus the final
    // assignment — persist it so k-means doesn't re-read parquet each time.
    val base = graft.util.Caches.retain(corpus.withColumn("__v", col(vecCol)))
    for (_ <- 0 until iters) {
      val assigned = base.withColumn("cell", assignCol)
      val sums = assigned
        .select(col("cell"), posexplode(col("__v")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("x").cast("double")).as("m"))
        .collect()
      val next = centroids.map(_.clone())
      sums.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      centroids = next
    }
    (base.withColumn("cell", assignCol).drop("__v"), centroids)
  }

  /** IVF approximate top-k: rank by cosine within the query's `nProbes`
    * nearest cells (multi-probe raises recall at nProbes × the candidate
    * volume; corpus vectors stay single-cell — only queries fan out).
    * Recall depends on corpus shape: cluster structure HELPS, because
    * k-means cells align with real clusters (BENCH.md §RecallScale:
    * recall@10 at 1 probe is 0.79 on a well-separated mixture vs 0.43
    * near-uniform). Size nProbes for the overlapping-cluster floor, not
    * the clustered average. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, dim: Int, nCells: Int, iters: Int,
              k: Int, nProbes: Int = 1): DataFrame = {
    val (assigned, centroids) = ivfAssign(corpus, idCol, vecCol, dim, nCells, iters)
    val cb = assigned
      .select(col(idCol).as("nid"), col(vecCol).as("nv"), col("cell"))
      .withColumn("nn", expr("vec_norm(nv)"))
    // queries re-derive their probe cells from the final centroids; the
    // explode fans each query out to its nProbes cells for the equi-join.
    val qb = queries
      .select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .withColumn("qn", expr("vec_norm(qv)"))
      .withColumn("cell",
        explode(probeCellsCol("qv", centroids, nProbes).getField("cell")))
    val scored = cb.join(broadcast(qb), Seq("cell"))
      .where(col("qid") =!= col("nid"))
      .withColumn("cos", expr("vec_dot(qv, nv)") / (col("qn") * col("nn")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(desc("cos"), asc("nid"))))
      .where(col("rank") <= k)
      .select(col("qid").as("query_id"), col("nid").as("neighbor_id"), col("rank"))
  }

  /** Multi-probe sign-LSH top-k (the probing-sequence idea of Lv et al.,
    * VLDB'07): corpus vectors are bucketed once by [[signLshBuckets]]; each
    * query probes its own bucket PLUS every combination of flipping its
    * `nFlipBits` lowest-|margin| hyperplane bits — the bits most likely to
    * disagree for a true neighbor. 2^nFlipBits probe buckets per query ≈
    * 2^nFlipBits/2^nBits of the corpus scanned: recall rises steeply with
    * nFlipBits while staying sub-linear. Probe generation runs as a typed
    * mapPartitions on the (small) query side only — the Scala dot loop
    * reproduces the expression-side arithmetic exactly (same accumulation
    * order, float→double widening), so buckets agree with the corpus pass. */
  def multiProbeLshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                        vecCol: String, dim: Int, nBits: Int, k: Int,
                        nFlipBits: Int = 4, nTables: Int = 4,
                        seed: Int = 42): DataFrame = {
    require(nFlipBits <= nBits, "cannot flip more bits than the bucket has")
    val spark = corpus.sparkSession
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    // Corpus pass: one (nid, tbl, bucket) row per table — buckets only, the
    // vectors aren't duplicated across tables (joined back after dedup).
    val tables = (0 until nTables).map { t =>
      struct(lit(t).as("tbl"), bucketCol(vecCol, dim, nBits, seed + t).as("bucket"))
    }
    val cb = corpus
      .select(col(idCol).as("nid"), explode(array(tables: _*)).as("tb"))
      .select(col("nid"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val planes: Array[Array[Array[Double]]] = Array.tabulate(nTables, nBits, dim)(
      (t, b, i) => planeWeight(seed + t, b, i))
    val probes = queries
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Seq[Float])]
      .mapPartitions(_.flatMap { case (qid, v) =>
        (0 until nTables).flatMap { t =>
          val dots = planes(t).map { w =>
            var s = 0.0
            var i = 0
            val n = math.min(v.length, w.length)
            while (i < n) { s += v(i).toDouble * w(i); i += 1 }
            s
          }
          val bucket = dots.zipWithIndex.map { case (d, b) => if (d > 0) 1L << b else 0L }.sum
          val flip = dots.zipWithIndex.sortBy { case (d, _) => math.abs(d) }
            .take(nFlipBits).map(_._2)
          (0 until (1 << nFlipBits)).map { m =>
            var p = bucket
            var j = 0
            while (j < nFlipBits) { if (((m >> j) & 1) == 1) p ^= 1L << flip(j); j += 1 }
            (qid, t, p)
          }.distinct
        }
      })
      .toDF("qid", "tbl", "bucket")
    // candidates can repeat across tables → dedup before scoring
    val cand = cb.join(broadcast(probes), Seq("tbl", "bucket"))
      .select(col("qid"), col("nid")).distinct()
    val nvs = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"))
      .withColumn("nn", expr("vec_norm(nv)"))
    val qb = queries.select(col(idCol).cast("long").as("qid"), col(vecCol).as("qv"))
      .withColumn("qn", expr("vec_norm(qv)"))
    val scored = cand.join(nvs, Seq("nid"))
      .join(broadcast(qb), Seq("qid"))
      .where(col("qid") =!= col("nid"))
      .withColumn("cos", expr("vec_dot(qv, nv)") / (col("qn") * col("nn")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(desc("cos"), asc("nid"))))
      .where(col("rank") <= k)
      .select(col("qid").as("query_id"), col("nid").as("neighbor_id"), col("rank"))
  }

  /** Approximate top-k: cosine ranking restricted to the query's bucket.
    * Output: (query_id, neighbor_id, rank) — recall < 1 by design. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, dim: Int, nBits: Int, k: Int): DataFrame = {
    val cb = signLshBuckets(corpus, idCol, vecCol, dim, nBits)
      .select(col(idCol).as("nid"), col(vecCol).as("nv"), col("bucket"))
      .withColumn("nn", expr("vec_norm(nv)"))
    val qb = signLshBuckets(queries, idCol, vecCol, dim, nBits)
      .select(col(idCol).as("qid"), col(vecCol).as("qv"), col("bucket"))
      .withColumn("qn", expr("vec_norm(qv)"))
    val scored = cb.join(broadcast(qb), Seq("bucket"))
      .where(col("qid") =!= col("nid"))
      .withColumn("cos", expr("vec_dot(qv, nv)") / (col("qn") * col("nn")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(desc("cos"), asc("nid"))))
      .where(col("rank") <= k)
      .select(col("qid").as("query_id"), col("nid").as("neighbor_id"), col("rank"))
  }
}
