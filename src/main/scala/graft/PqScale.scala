package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Scale probe for PQ-ADC ANN (Ann.pqTrain/pqCodes/pqScoreTopK), sibling of
 * [[SemanticScale]]: the sf0.1 battery runs it on 2k embeddings — far too
 * small for the serving-cost claims to show. This main synthesizes a
 * clustered corpus with PLANTED near-duplicates of each query (tiny jitter,
 * cos ≈ 0.999 vs ~0.86 for same-cluster bulk) and times the deployment's
 * phases separately:
 *
 *  - train:  codebook k-means (offline, once per corpus);
 *  - encode: code assignment + norm (offline, once per corpus at ingest —
 *            the persisted 8-bytes-per-vector PQ store);
 *  - adc:    LUT + ADC scan over the code table + exact re-rank of the
 *            shortlist (the per-query-batch serving cost);
 *  - brute:  exact cosine top-k over full float vectors (the baseline).
 *
 * Metric note: exact-top-k overlap is NOT the pass criterion on this
 * corpus — within a ~3k-member cluster every vector ties near cos 0.86
 * (differences in the 3rd decimal are pure noise ranking), which no
 * 8-byte quantizer can and no retrieval use-case needs to reproduce. The
 * criterion is dup_recall: the planted true matches, separated from the
 * bulk by construction like real retrieval targets, must ALL surface in
 * the re-ranked top-k. Recorded in BENCH.md: dup_recall = 1.0 and the adc
 * serving wall vs the brute scan at both sizes.
 */
object PqScale {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toLong) else Seq(200000L, 1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", ScaleDefaults.shuffleParts(cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)

    // The standard serving shape: 8-bit codebooks (nCodes = 256; the
    // battery's 16-code variant is sized for its 500-vector corpus).
    val dim = 64; val nSub = 16; val nCodes = 256; val iters = 2
    val k = 10; val rerank = 8; val nQueries = 32; val dupsPerQuery = 5
    sizes.foreach { n =>
      val latent = 64 // clustered corpus: 64 latent centers
      val nPlanted = nQueries * dupsPerQuery
      val emb = graft.util.Caches.retain(spark.range(n)
        // The last nPlanted ids are jittered copies of the queries
        // (ids 0..nQueries): the well-separated true matches.
        .withColumn("src", when(col("id") >= n - nPlanted,
          pmod(col("id"), lit(nQueries))).otherwise(col("id")))
        .select(col("id").as("vec_id"),
          // center (±1, shared per latent cluster, keyed by src so copies
          // replicate their source) + per-src noise (±0.4) + tiny per-id
          // jitter (±0.02) that separates a copy from its source without
          // leaving its neighborhood.
          expr(s"""transform(sequence(1, $dim), j ->
            CAST((pmod(xxhash64(pmod(src, $latent), j), 1000) / 500.0 - 1.0) +
                 (pmod(xxhash64(src, j + 100), 1000) / 1250.0 - 0.4) +
                 (pmod(xxhash64(vec_id, j + 200), 100) / 2500.0) AS FLOAT))""")
            .as("embedding"))
        .drop("src"))
      emb.count() // materialize so no phase pays generation cost
      val queries = emb.where(col("vec_id") < nQueries)

      val t0 = System.nanoTime()
      val books = operators.Ann.pqTrain(emb, "vec_id", "embedding",
        dim, nSub, nCodes, iters)
      val tTrain = (System.nanoTime() - t0) / 1e9

      val t1 = System.nanoTime()
      val codes = graft.util.Caches.retain(
        operators.Ann.pqCodes(emb, "vec_id", "embedding", books))
      codes.count()
      val tEncode = (System.nanoTime() - t1) / 1e9

      val t2 = System.nanoTime()
      val pq = operators.Ann.pqScoreTopK(emb, queries, "vec_id", "embedding",
        books, k, rerank, precomputedCodes = Some(codes))
      pq.count()
      val tAdc = (System.nanoTime() - t2) / 1e9

      val t2b = System.nanoTime()
      operators.Ann.pqScoreTopK(emb, queries, "vec_id", "embedding",
        books, k, rerank = 1, precomputedCodes = Some(codes)).count()
      val tAdc0 = (System.nanoTime() - t2b) / 1e9

      // The at-scale claim is scan FOOTPRINT, not CPU: persist both stores
      // and compare bytes (the code table is what an out-of-memory corpus
      // scan actually reads).
      def dirBytes(p: String): Long = {
        val d = new java.io.File(p)
        if (!d.exists) 0L else d.listFiles.map(_.length).sum
      }
      val base = s"/tmp/graft_pqscale/$n"
      codes.write.mode("overwrite").parquet(s"$base/codes")
      emb.write.mode("overwrite").parquet(s"$base/vectors")
      val codeBytes = dirBytes(s"$base/codes")
      val vecBytes = dirBytes(s"$base/vectors")

      val t3 = System.nanoTime()
      val exact = operators.Ann.bruteForceTopK(emb, queries, "vec_id",
        "embedding", k)
      val exactRows = exact.count()
      val tBrute = (System.nanoTime() - t3) / 1e9

      // IVFADC: coarse routing over the same corpus (64 cells, 4 probes) —
      // the sub-linear serving path. Index build = k-means + residual
      // codes (offline, per ingest); serve = LUT + cell-local ADC + exact
      // re-rank. cand_frac measures the fraction of the code table the ADC
      // scan actually touches (Σ probed-cell sizes / (n × queries)) — the
      // sub-linearity claim, measured rather than argued.
      val nCells = 64; val nProbes = 4
      val t4 = System.nanoTime()
      val (ivfCodes0, cents, rbooks) = operators.Ann.ivfPqIndex(emb,
        "vec_id", "embedding", dim, nCells, 2, nSub, nCodes, iters)
      val ivfCodes = graft.util.Caches.retain(ivfCodes0)
      ivfCodes.count()
      val tIvfIndex = (System.nanoTime() - t4) / 1e9
      val t5 = System.nanoTime()
      val ivfpq = operators.Ann.ivfPqServe(emb, queries, "vec_id",
        "embedding", cents, rbooks, ivfCodes, k, nProbes, rerank)
      ivfpq.count()
      val tIvfServe = (System.nanoTime() - t5) / 1e9
      val candRows = queries.select(col("vec_id"),
          explode(operators.Ann.probeCellsCol("embedding", cents, nProbes)
            .getField("cell")).as("cell"))
        .join(ivfCodes.groupBy("cell").count(), "cell")
        .agg(sum("count")).collect()(0).getLong(0)
      val plantedIvf = ivfpq
        .where(col("neighbor_id") >= n - nPlanted &&
          pmod(col("neighbor_id"), lit(nQueries)) === col("query_id"))
        .count()
      val overlapIvf = ivfpq.select(col("query_id"), col("neighbor_id"))
        .join(exact.select(col("query_id"), col("neighbor_id")),
          Seq("query_id", "neighbor_id"))
        .count().toDouble / exactRows

      // Planted-match recall: every (query, copy) pair must surface in the
      // re-ranked PQ top-k (k > dupsPerQuery, so room is not the binder).
      val planted = pq
        .where(col("neighbor_id") >= n - nPlanted &&
          pmod(col("neighbor_id"), lit(nQueries)) === col("query_id"))
        .count()
      val dupRecall = planted.toDouble / nPlanted
      val overlap = pq.select(col("query_id"), col("neighbor_id"))
        .join(exact.select(col("query_id"), col("neighbor_id")),
          Seq("query_id", "neighbor_id"))
        .count().toDouble / exactRows
      graft.util.Caches.drain()
      println(f"PQSCALE n=$n train=$tTrain%.1f encode=$tEncode%.1f " +
        f"adc=$tAdc%.1f adc_norerank=$tAdc0%.1f brute=$tBrute%.1f " +
        f"dup_recall=$dupRecall%.2f topk_overlap=$overlap%.2f " +
        f"code_bytes=$codeBytes vec_bytes=$vecBytes " +
        f"store_ratio=${vecBytes.toDouble / codeBytes}%.1f " +
        f"adc_vecs_per_sec_per_core=${n.toDouble * nQueries / tAdc / cpus}%.0f " +
        f"brute_vecs_per_sec_per_core=${n.toDouble * nQueries / tBrute / cpus}%.0f")
      println(f"IVFPQSCALE n=$n cells=$nCells probes=$nProbes " +
        f"index=$tIvfIndex%.1f serve=$tIvfServe%.1f " +
        f"dup_recall=${plantedIvf.toDouble / nPlanted}%.2f " +
        f"topk_overlap=$overlapIvf%.2f " +
        f"cand_frac=${candRows.toDouble / (n.toDouble * nQueries)}%.3f")
    }
    spark.stop()
  }
}
