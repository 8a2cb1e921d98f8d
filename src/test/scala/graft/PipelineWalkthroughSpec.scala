package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Dsir, Profile, Sampling, TextAnalysis}
import graft.sources.DatasetExporter

/**
 * End-to-end acceptance walkthrough of the training-data pipeline — the
 * full user story over the real `documents` table, every stage the
 * engine's own operator, every hand-off pinned by an invariant:
 *
 *   profile → quality filter → exact dedup → decontaminate → DSIR select
 *   → train/val/test split → interleave by language → token-budget shard
 *   → size-targeted export → lossless read-back.
 *
 * The point is compositional: each operator is oracle-gated on its own
 * battery row; this spec proves they CHAIN — schemas line up, counts
 * stay monotone where they must, survivors respect the previous stage's
 * contract, and the exported shards reconstruct the selected corpus
 * exactly.
 */
class PipelineWalkthroughSpec extends SparkSpec {

  private val sfDir = sys.env.getOrElse("GRAFT_FUZZ_SF", "/root/testdata/sf0.001")

  test("raw documents to training shards, invariants at every stage") {
    val raw = graft.ops.Tables.documents(spark, sfDir)
    val n0 = raw.count()
    assert(n0 > 0)

    // 1. Profile: one row per requested column, no null doc ids.
    val prof = Profile.profile(raw, Seq("doc_id", "text", "lang", "source"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(prof.size == 4)
    assert(prof("doc_id").getLong(2) == 0L, "doc_id must have no nulls")
    assert(prof("doc_id").getLong(3) == n0, "doc_id must be unique")

    // 2. Quality filter: drop the shortest docs (below 40 chars).
    val cleaned = raw.where(col("n_chars") >= 40)
    val n2 = cleaned.count()
    assert(n2 > 0 && n2 <= n0)

    // 3. Exact dedup, keep lowest id per text: survivors are text-unique.
    val deduped = cleaned.join(
      cleaned.groupBy(col("text")).agg(min(col("doc_id")).as("doc_id")),
      Seq("doc_id", "text"), "leftsemi")
    val n3 = deduped.count()
    assert(n3 <= n2)
    assert(deduped.select(col("text")).distinct().count() == n3,
      "two survivors share a text")

    // 4. Decontaminate against a tiny "eval set" (3 held-out docs): no
    //    survivor may share an 8-token window with the eval set.
    val evalSet = raw.where(col("doc_id") % 19 === 3)
      .select(col("doc_id"), col("text"))
    val contaminated = TextAnalysis.contamination(
      deduped, evalSet, "doc_id", "text", n = 8)
      .select(col("doc_id")).distinct()
    val decont = deduped.join(contaminated, Seq("doc_id"), "left_anti")
    val n4 = decont.count()
    assert(n4 <= n3)
    assert(TextAnalysis.contamination(decont, evalSet, "doc_id", "text", n = 8)
      .count() == 0, "contaminated docs survived the scrub")

    // 5. DSIR selection: keep the half best aligned with the target slice.
    val fix = java.nio.file.Files.createTempDirectory("walk").toString + "/model"
    val scored = Dsir.trainAndScore(spark, decont,
      decont.where(col("doc_id") % 5 === 0), "doc_id", "text",
      nBuckets = 128, salt = "walk", fixturePath = fix)
    val k = math.max(1, (n4 / 2).toInt)
    val selected = decont.join(
      Dsir.selectTopK(scored, k).select(col("doc_id")), Seq("doc_id"), "leftsemi")
    val n5 = selected.count()
    assert(n5 == math.min(k.toLong, n4))

    // 6. Split: train/val/test partition the selection exactly.
    val split = selected.withColumn("split",
      TextAnalysis.hashSplit(col("doc_id"), "walksplit"))
    val bySplit = split.groupBy(col("split")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.values.sum == n5, "splits must partition the selection")
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    val train = split.where(col("split") === "train").drop("split")

    // 7. Interleave by language (en twice the rest): a prefix of the mix
    //    order is language-balanced to the weights within one row per key.
    val weighted = train.withColumn("w",
      when(col("lang") === "en", lit(2L)).otherwise(lit(1L)))
    val mixed = Sampling.interleaveOrder(weighted, "lang", "doc_id", "w", "walkmix")
    val ordered = mixed.select(col("doc_id"), col("lang"), col("w"), col("mix_key"))
      .collect().sortBy(r => (r.getDouble(3), r.getString(1), r.getLong(0)))
    val perLang = ordered.groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    val running = collection.mutable.Map[String, Long]().withDefaultValue(0L)
    ordered.foreach { r =>
      running(r.getString(1)) += 1
      val t = r.getDouble(3)
      running.foreach { case (lang, c) =>
        val w = if (lang == "en") 2L else 1L
        val due = math.min(perLang(lang), math.floor(t * w + 0.5).toLong)
        assert(math.abs(c - due) <= 1, s"mix drift at $t: $lang $c vs $due")
      }
    }

    // 8. Shard the train split to ~500-token shards: shards are contiguous
    //    0..K and every shard's cumulative coverage reaches its upper
    //    boundary (the operator's contract — a boundary-straddling row
    //    belongs to the earlier shard, so per-shard sums may dip under
    //    budget but the running total never lags a boundary).
    val shards = Sampling.shardByBudget(train, "doc_id",
      TextAnalysis.tokenCount(col("text")), budget = 500L, salt = "walkshard")
    val shardTotals = shards.groupBy(col("shard"))
      .agg(sum(col("n_tokens")).as("t")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    assert(shardTotals.map(_._1).toSeq == shardTotals.indices.map(_.toLong),
      "shards must be contiguous 0..K")
    shardTotals.dropRight(1).scanLeft(0L)(_ + _._2).drop(1)
      .zipWithIndex.foreach { case (cum, k) =>
        assert(cum >= (k + 1) * 500L, s"coverage lags boundary ${k + 1}: $cum") }
    assert(shards.count() == train.count())

    // 9. Export the train split and read it back losslessly.
    val out = java.nio.file.Files.createTempDirectory("walkout").toString + "/train"
    val st = DatasetExporter.export(train, "doc_id", out,
      targetFileBytes = 32L * 1024L, salt = "walkexp")
    assert(st.rows == train.count())
    val back = spark.read.parquet(out)
    assert(back.count() == st.rows)
    val a = train.select(col("doc_id"), md5(col("text")).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = back.select(col("doc_id"), md5(col("text")).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b, "export round-trip altered the corpus")
  }
}
