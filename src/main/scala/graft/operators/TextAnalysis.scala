package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data pipelines: token counting,
 * quality scoring, language ID, and document fingerprinting. All pure
 * codegen'd column expressions — no UDFs, so Catalyst keeps them inside
 * whole-stage codegen and pushes the `text` column read straight to parquet.
 */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(textCol: Column): Column = size(split(textCol, " "))

  /** BPE-ish regex token count: letter runs, digit runs, and single
    * non-alphanumeric marks as separate tokens (the pre-tokenization split
    * BPE vocabularies build on). The alternatives match disjoint leading
    * characters, so Java and RE2 regex engines agree. */
  val BpeishPattern = "[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 ]"
  def bpeishTokenCount(textCol: Column): Column =
    size(regexp_extract_all(textCol, lit(BpeishPattern), lit(0)))

  /** Per-document quality features: char count, token count, mean token
    * length, stopword ratio, and Gopher-style symbol/digit ratios (the
    * rule-based signals corpus cleaning pipelines threshold on). Ratios are
    * single divisions of exact integer counts — deterministic across
    * engines. */
  def quality(docs: DataFrame, idCol: String, textCol: String,
              stopwords: Seq[String]): DataFrame = {
    val stopList = stopwords.map(w => s"'$w'").mkString(", ")
    def strippedLen(pattern: String) =
      length(regexp_replace(col(textCol), pattern, ""))
    docs.select(
      col(idCol),
      length(col(textCol)).as("n_chars"),
      tokenCount(col(textCol)).as("n_tokens"),
      ((length(col(textCol)) - (tokenCount(col(textCol)) - 1)).cast("double") /
        tokenCount(col(textCol))).as("avg_tok_len"),
      (expr(s"size(filter(split($textCol, ' '), t -> t IN ($stopList)))").cast("double") /
        tokenCount(col(textCol))).as("stop_ratio"),
      // chars removed by stripping the class = count of chars IN the class
      ((length(col(textCol)) - strippedLen("[^a-zA-Z0-9 ]")).cast("double") /
        length(col(textCol))).as("punct_ratio"),
      ((length(col(textCol)) - strippedLen("[0-9]")).cast("double") /
        length(col(textCol))).as("digit_ratio"))
  }

  /** Marker-based language ID: first matching marker wins. A deliberately
    * SQL-mirrorable heuristic (the trigram-profile scorer below is the
    * richer variant; this one is exactly expressible as a CASE in any
    * engine, which the correctness oracle requires). */
  def langIdMarkers(textCol: Column, markers: Seq[(String, String)],
                    default: String): Column =
    markers.foldRight(lit(default): Column) { case ((marker, lang), acc) =>
      when(textCol.contains(marker), lang).otherwise(acc)
    }

  /** Character-trigram profile scorer: returns the profile key whose trigram
    * set overlaps the document's trigrams most (ties → lexicographically
    * smallest key). Profiles are small and broadcast as literal arrays. */
  def langIdTrigrams(docs: DataFrame, idCol: String, textCol: String,
                     profiles: Map[String, Seq[String]]): DataFrame = {
    val scores: Seq[Column] = profiles.toSeq.sortBy(_._1).map { case (lang, tris) =>
      val triList = tris.map(t => s"'${t.replace("'", "''")}'").mkString(", ")
      struct(
        expr(s"size(filter(array($triList), t -> contains($textCol, t)))").as("score"),
        lit(lang).as("lang"))
    }
    // Highest score wins; on ties the earlier (lexicographically smaller)
    // profile key is kept because `when` only replaces on strict >.
    docs.select(
      col(idCol),
      scores.reduceLeft[(Column)]((a, b) =>
        when(b.getField("score") > a.getField("score"), b).otherwise(a))
        .getField("lang").as("lang_pred"))
  }

  /** Document fingerprint: lexicographic min of md5 over all char n-gram
    * windows (winnowing-style rolling fingerprint, engine-independent). */
  def fingerprint(textCol: String, n: Int): Column =
    expr(s"array_min(transform(sequence(1, greatest(length($textCol)-${n - 1}, 1)), " +
         s"i -> md5(substring($textCol, i, $n))))")

  /** Token-window chunking with overlap — the standard training-data prep
    * step that splits long documents into model-context-sized pieces.
    * Chunk i covers tokens [i·stride, i·stride + chunkSize) with stride =
    * chunkSize − overlap; the last chunk is short (never dropped), and a
    * doc shorter than chunkSize yields exactly one chunk. Output: one row
    * per chunk (doc_id, chunk_idx, chunk). Pure array expressions per
    * document row — chunk generation never shuffles; at 100 TB this is a
    * map-only stage that preserves the input partitioning. */
  def chunks(docs: DataFrame, idCol: String, textCol: String,
             chunkSize: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize, "overlap must be < chunkSize")
    val stride = chunkSize - overlap
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("__toks"))
      .withColumn("__nc", greatest(lit(1),
        expr(s"CAST((size(__toks) - $overlap + $stride - 1) DIV $stride AS INT)")))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, __nc - 1), " +
        s"i -> array_join(slice(__toks, i * $stride + 1, $chunkSize), ' '))"))
        .as(Seq("chunk_idx", "chunk")))
  }
}
