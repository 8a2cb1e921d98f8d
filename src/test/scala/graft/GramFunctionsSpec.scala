package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the r19 native gram expressions bit-for-bit against the built-in
  * HOF forms they replaced in the hot paths (LmScore.trigrams,
  * Dedup.charShingles, Dsir's gram+hashBucket pipeline): any divergence —
  * order, distinctness, short-string fallback, unicode char positions,
  * empty/whitespace tokens — would silently shift oracle-gated results. */
class GramFunctionsSpec extends SparkSpec {

  private def textDf(texts: Seq[String]) = {
    val schema = StructType(Seq(StructField("t", StringType, nullable = true)))
    frame(schema, texts.map(s => Map[String, Any]("t" -> s)))
  }

  // Deterministic fuzz corpus: edge shapes + pseudo-random ASCII + unicode.
  private val rng = new scala.util.Random(19)
  private val alphabet = "ab c".toCharArray
  private val fuzz: Seq[String] =
    Seq("", " ", "  ", "a", "ab", "abc", "abcd", "a b", " a b ", "aaaaa",
      "héllo wörld", "日本語のテキスト", "a\tb", "x  y") ++
      (1 to 60).map(_ => (0 until rng.nextInt(40)).map(_ =>
        alphabet(rng.nextInt(alphabet.length))).mkString)

  test("char_ngrams equals transform(sequence, substring) for n in 2..5") {
    graft.functions.GramFunctions.register(spark)
    for (n <- 2 to 5) {
      val df = textDf(fuzz).select(
        call_function("char_ngrams", col("t"), lit(n)).as("fast"),
        expr(s"CASE WHEN length(t) >= $n THEN transform(" +
          s"sequence(1, length(t) - ${n - 1}), i -> substring(t, i, $n)) " +
          "ELSE array() END").as("ref"))
      val bad = df.where(not(col("fast") <=> col("ref"))).count()
      assert(bad == 0, s"char_ngrams(n=$n) diverged on $bad rows")
    }
  }

  test("char_shingles equals array_distinct(transform(...)) incl. short fallback") {
    graft.functions.GramFunctions.register(spark)
    for (n <- 2 to 5) {
      val df = textDf(fuzz).select(
        call_function("char_shingles", col("t"), lit(n)).as("fast"),
        expr(s"array_distinct(transform(sequence(1, greatest(length(t)-${n - 1}, 1)), " +
          s"i -> substring(t, i, $n)))").as("ref"))
      val bad = df.where(not(col("fast") <=> col("ref"))).count()
      assert(bad == 0, s"char_shingles(n=$n) diverged on $bad rows")
    }
  }

  test("word_ngrams_distinct equals array_distinct(transform(slice-join)) incl. short docs") {
    graft.functions.GramFunctions.register(spark)
    for (n <- Seq(2, 3, 13)) {
      val df = textDf(fuzz).select(
        call_function("word_ngrams_distinct", col("t"), lit(n)).as("fast"),
        expr(s"""CASE WHEN size(split(t, ' ')) >= $n THEN
                |array_distinct(transform(sequence(1, size(split(t, ' ')) - ${n - 1}),
                |i -> array_join(slice(split(t, ' '), i, $n), ' ')))
                |ELSE array() END""".stripMargin).as("ref"))
      val bad = df.where(not(col("fast") <=> col("ref"))).count()
      assert(bad == 0, s"word_ngrams_distinct(n=$n) diverged on $bad rows")
    }
  }

  test("md5_bits64 bit p equals the hex-char instr/substring extraction") {
    graft.functions.GramFunctions.register(spark)
    val withBits = textDf(fuzz).where(col("t").isNotNull)
      .withColumn("h64", call_function("md5_bits64", col("t")))
      .withColumn("hex", md5(col("t")))
    for (p <- Seq(0, 1, 3, 4, 7, 31, 32, 62, 63)) {
      val bad = withBits.where(
        expr(s"(h64 >> ${63 - p}) & 1") =!= expr(
          s"shiftright(instr('0123456789abcdef', substring(hex, ${p / 4 + 1}, 1)) - 1, " +
          s"${3 - (p % 4)}) & 1")).count()
      assert(bad == 0, s"md5_bits64 bit $p diverged on $bad rows")
    }
  }

  test("minhash_slices equals the md5(concat)/substring slice chain") {
    graft.functions.GramFunctions.register(spark)
    for (k <- Seq(3, 8)) {
      val nDigests = (k + 3) / 4
      val withRef = (0 until nDigests).foldLeft(
        textDf(fuzz).where(col("t").isNotNull)) { (df, d) =>
        df.withColumn(s"__m$d", md5(concat(lit(s"$d:"), col("t"))))
      }
      val both = withRef.withColumn("fast",
        call_function("minhash_slices", col("t"), lit(k)))
      for (i <- 0 until k) {
        val bad = both.where(element_at(col("fast"), i + 1) =!=
          substring(col(s"__m${i / 4}"), 1 + 8 * (i % 4), 8)).count()
        assert(bad == 0, s"minhash_slices(k=$k) slice $i diverged on $bad rows")
      }
    }
  }

  test("dsir_gram_buckets equals split+bigram transform+md5 hashBucket") {
    graft.functions.GramFunctions.register(spark)
    for ((nBuckets, salt) <- Seq((256, "dsir"), (17, "x:y"))) {
      // reference: Dsir's Column pipeline verbatim (unigrams then bigrams
      // per doc; compared as sorted multisets since the union interleaves)
      val ref = textDf(fuzz)
        .withColumn("__ts", split(col("t"), " "))
        .select(col("t"), concat(col("__ts"), expr(
          "CASE WHEN size(__ts) >= 2 THEN transform(" +
          "sequence(1, size(__ts) - 1), i -> concat(__ts[i-1], ' ', __ts[i])) " +
          "ELSE array() END")).as("grams"))
        .select(col("t"), expr(
          s"""array_sort(transform(grams, g ->
             |pmod(CAST(conv(substring(md5(concat('$salt:', g)), 1, 8), 16, 10)
             |  AS BIGINT), ${nBuckets}L)))""".stripMargin).as("ref"))
      val both = ref.withColumn("fast",
        array_sort(call_function("dsir_gram_buckets",
          col("t"), lit(nBuckets), lit(salt))))
      val bad = both.where(not(col("fast") <=> col("ref"))).count()
      assert(bad == 0,
        s"dsir_gram_buckets(nBuckets=$nBuckets, salt=$salt) diverged on $bad rows")
    }
  }
}
