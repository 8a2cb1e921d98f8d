package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst n-gram generators for the text-pipeline hot paths. The
 * built-in form — `transform(sequence(1, len-n+1), i -> substring(s, i, n))`
 * — evaluates the lambda INTERPRETED per element (higher-order functions
 * never enter whole-stage codegen) and each `substring(s, i, _)` re-walks
 * the string from the start to locate char i, so a document costs
 * O(len²) byte scans plus len interpreted-expression dispatches. These
 * expressions produce the identical array in ONE O(len) pass inside the
 * codegen'd stage (the [[FloatVecDot]] treatment for grams; measured ~4×
 * on the LM-scoring and shingle rows at sf0.1).
 *
 * Bit-identity contract (the DuckDB oracles depend on it):
 *  - [[CharNgrams]] equals `transform(sequence(1, length(s) - n + 1),
 *    i -> substring(s, i, n))` — all n-grams in order, empty array when
 *    the string is shorter than n;
 *  - [[CharShingles]] equals `array_distinct(transform(sequence(1,
 *    greatest(length(s) - n + 1, 1)), i -> substring(s, i, n)))` — the
 *    [[graft.operators.Dedup.charShingles]] form: distinct-in-first-
 *    occurrence-order, with the whole (short) string as the single
 *    shingle when length(s) <= n - 1 (substring past the end truncates);
 *  - char positions are CODE POINTS (the same UTF-8 lead-byte walk
 *    `UTF8String.substring` does), so non-ASCII inputs agree with the
 *    built-in form byte-for-byte.
 */
abstract class NgramBase extends UnaryExpression {
  /** n-gram size; validated in the [[GramFunctions]] builders (an abstract
    * member must not be read in this class's constructor body — subclass
    * fields are uninitialized there, and the check would also re-fire
    * during task deserialization). */
  def n: Int

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  /** Byte offsets of each code-point start in `bytes`, plus the end
    * offset — one O(len) pass (UTF-8 continuation bytes are 10xxxxxx). */
  protected final def charOffsets(bytes: Array[Byte]): Array[Int] = {
    var chars = 0
    var i = 0
    while (i < bytes.length) { if ((bytes(i) & 0xc0) != 0x80) chars += 1; i += 1 }
    val offs = new Array[Int](chars + 1)
    var c = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) { offs(c) = i; c += 1 }
      i += 1
    }
    offs(chars) = bytes.length
    offs
  }

  def compute(s: UTF8String): ArrayData

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngrams", this, classOf[NgramBase].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }
}

/** All char n-grams of the input, in order; `[]` when shorter than n. */
case class CharNgrams(child: Expression, n: Int) extends NgramBase {
  override def prettyName: String = "char_ngrams"

  override def compute(s: UTF8String): ArrayData = {
    // clone() detaches from a reused UnsafeRow buffer; its backing array is
    // exactly sized, so getBytes returns it without a second copy and every
    // gram below slices that one private copy.
    val bytes = s.clone().getBytes
    val offs = charOffsets(bytes)
    val chars = offs.length - 1
    if (chars < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](chars - n + 1)
    var i = 0
    while (i <= chars - n) {
      out(i) = UTF8String.fromBytes(bytes, offs(i), offs(i + n) - offs(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

/** Distinct char n-grams in first-occurrence order; a string shorter than
  * n yields itself as the single shingle (the Dedup.charShingles form). */
case class CharShingles(child: Expression, n: Int) extends NgramBase {
  override def prettyName: String = "char_shingles"

  override def compute(s: UTF8String): ArrayData = {
    val bytes = s.clone().getBytes
    val offs = charOffsets(bytes)
    val chars = offs.length - 1
    if (chars <= n - 1)
      return new GenericArrayData(
        Array[Any](UTF8String.fromBytes(bytes, 0, bytes.length)))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= chars - n) {
      seen.add(UTF8String.fromBytes(bytes, offs(i), offs(i + n) - offs(i)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}

/** Distinct `n`-token windows of the input joined with a single space, in
  * first-occurrence order — equals `array_distinct(transform(sequence(1,
  * size(toks) - n + 1), i -> array_join(slice(toks, i, n), ' ')))` over
  * `toks = split(s, ' ')`, with `[]` when the document has fewer than n
  * tokens (the [[graft.operators.TextAnalysis.contamination]] gram form,
  * computed in one codegen'd call instead of an interpreted per-window
  * slice+join lambda). */
case class WordNgramsDistinct(child: Expression, n: Int) extends NgramBase {
  override def prettyName: String = "word_ngrams_distinct"

  override def compute(s: UTF8String): ArrayData = {
    val toks = s.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgramsDistinct =
    copy(child = newChild)
}

/**
 * Hashed DSIR feature buckets of a document in one pass: word unigrams +
 * adjacent bigrams over the literal `split(text, ' ')` tokenization, each
 * bucketed by `pmod(conv(substring(md5('<salt>:' || gram), 1, 8), 16, 10),
 * nBuckets)` — bit-identical to [[graft.operators.Dsir.hashBucket]]'s md5
 * family over [[graft.operators.Dsir]]'s gram generator, but computed as
 * ONE codegen'd call per document instead of two explodes + an interpreted
 * bigram lambda + a 5-expression md5/conv/substring/pmod chain per gram.
 * Output order: unigrams left-to-right, then bigrams left-to-right (the
 * downstream count/sum aggregates are order-insensitive).
 */
case class DsirGramBuckets(child: Expression, nBuckets: Int, salt: String)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dsir_gram_buckets"

  @transient private lazy val saltBytes =
    s"$salt:".getBytes(StandardCharsets.UTF_8)
  @transient private lazy val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def bucket(md: MessageDigest, gram: String): Long = {
    md.reset()
    md.update(saltBytes)
    md.update(gram.getBytes(StandardCharsets.UTF_8))
    val d = md.digest()
    // first 8 hex chars == first 4 bytes as an unsigned 32-bit value
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    v % nBuckets
  }

  def compute(s: UTF8String): ArrayData = {
    // Java split(" ", -1) == Spark split(text, ' '): literal-space regex,
    // trailing empty tokens kept.
    val toks = s.toString.split(" ", -1)
    val md = digests.get()
    val nBi = if (toks.length >= 2) toks.length - 1 else 0
    val out = new Array[Long](toks.length + nBi)
    var i = 0
    while (i < toks.length) { out(i) = bucket(md, toks(i)); i += 1 }
    i = 0
    while (i < nBi) {
      out(toks.length + i) = bucket(md, toks(i) + " " + toks(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dsirGrams", this, classOf[DsirGramBuckets].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): DsirGramBuckets =
    copy(child = newChild)
}

/** First 8 bytes of md5(input) as a big-endian signed long — the bit-p
  * extraction `(h >> (63 - p)) & 1` equals the hex-char form
  * `shiftright(instr('0123456789abcdef', substring(md5(s), p/4 + 1, 1)) - 1,
  * 3 - (p % 4)) & 1` the SimHash bit sums used (bit p from the digest's
  * most-significant end). One digest + zero string parsing per token,
  * replacing 64 interpreted-ish instr/substring chains per row. */
case class Md5Bits64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_bits64"

  @transient private lazy val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def compute(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5bits", this, classOf[Md5Bits64].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Bits64 =
    copy(child = newChild)
}

/** The k MinHash hash values of one shingle as an array of 8-hex-char
  * strings: slice i = `substring(md5(concat('<i/4>:', s)), 1 + 8·(i%4), 8)`
  * — [[graft.operators.Dedup.minHashSignature]]'s md5 family, computed
  * with ceil(k/4) digests and no intermediate 32-char hex strings or
  * per-slice substring expressions. */
case class MinhashSlices(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_slices"

  @transient private lazy val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val hex = "0123456789abcdef".getBytes(StandardCharsets.UTF_8)

  def compute(s: UTF8String): ArrayData = {
    val md = digests.get()
    val sb = s.getBytes
    val out = new Array[Any](k)
    var d = 0
    while (d * 4 < k) {
      md.reset()
      md.update(s"$d:".getBytes(StandardCharsets.UTF_8))
      md.update(sb)
      val dig = md.digest()
      var j = 0
      while (j < 4 && d * 4 + j < k) {
        val h = new Array[Byte](8)
        var b = 0
        while (b < 4) {
          val v = dig(4 * j + b) & 0xff
          h(2 * b) = hex(v >> 4)
          h(2 * b + 1) = hex(v & 0xf)
          b += 1
        }
        out(d * 4 + j) = UTF8String.fromBytes(h)
        j += 1
      }
      d += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mhSlices", this, classOf[MinhashSlices].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSlices =
    copy(child = newChild)
}

object GramFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType)
        if v >= 1 => v
    case other => throw new IllegalArgumentException(
      s"$what must be a positive integer literal, got $other")
  }

  private def strLit(e: Expression, what: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: UTF8String, StringType) =>
      v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("char_ngrams"),
      new ExpressionInfo(classOf[CharNgrams].getName, "char_ngrams"),
      (children: Seq[Expression]) =>
        CharNgrams(children(0), intLit(children(1), "char_ngrams n"))),
    (FunctionIdentifier("char_shingles"),
      new ExpressionInfo(classOf[CharShingles].getName, "char_shingles"),
      (children: Seq[Expression]) =>
        CharShingles(children(0), intLit(children(1), "char_shingles n"))),
    (FunctionIdentifier("word_ngrams_distinct"),
      new ExpressionInfo(classOf[WordNgramsDistinct].getName, "word_ngrams_distinct"),
      (children: Seq[Expression]) =>
        WordNgramsDistinct(children(0), intLit(children(1), "word_ngrams_distinct n"))),
    (FunctionIdentifier("md5_bits64"),
      new ExpressionInfo(classOf[Md5Bits64].getName, "md5_bits64"),
      (children: Seq[Expression]) => Md5Bits64(children.head)),
    (FunctionIdentifier("minhash_slices"),
      new ExpressionInfo(classOf[MinhashSlices].getName, "minhash_slices"),
      (children: Seq[Expression]) =>
        MinhashSlices(children(0), intLit(children(1), "minhash_slices k"))),
    (FunctionIdentifier("dsir_gram_buckets"),
      new ExpressionInfo(classOf[DsirGramBuckets].getName, "dsir_gram_buckets"),
      (children: Seq[Expression]) =>
        DsirGramBuckets(children(0), intLit(children(1), "dsir_gram_buckets nBuckets"),
          strLit(children(2), "dsir_gram_buckets salt"))))

  /** Idempotent runtime registration ([[VectorFunctions.register]]'s
    * contract). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        ident.funcName, builder, "built-in")
    }
}
