package graft.functions

import java.security.MessageDigest
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, col, expr, explode, lit, md5, size, split}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native row-local span scrubber — streaming decontamination: the
 * [[DsirRowScore]]/[[LmRowScore]] treatment for
 * [[graft.operators.TextAnalysis.scrubSpans]]. The eval set's distinct
 * n-token window hashes ship DRIVER-HELD as a sorted array of FULL
 * 128-bit md5 values (two longs per hash — no truncation, so membership
 * is bit-identical to the batch pipeline's hex-string equi-join), and
 * each document is scrubbed inside its own row: split, hash every
 * window, binary-search the set, mark covered positions, rebuild the
 * text from survivors. No explode, no join, no shuffle, no state — a
 * stream scrubs documents as they arrive, trivially batching-invariant.
 *
 * MUST match `scrubSpans` byte-for-byte: same Java-regex split (limit
 * -1 — space runs round-trip), same joined-window md5 over UTF-8 bytes,
 * same covered-range semantics, single-space rebuild. Null text yields
 * NULL (the scrubSpans omission contract — callers filter).
 *
 * Driver-state bound: 16 bytes per distinct eval window — benchmark
 * suites (the decontamination use case) are thousands of documents,
 * i.e. at most a few million windows ⇒ tens of MB, the same class as
 * the blocklist Bloom bits. For eval sets beyond that, use the batch
 * `scrubSpans` whose hashes stay distributed.
 */
case class ScrubRowSpans(child: Expression, evalHashes: Array[Long], n: Int)
    extends UnaryExpression {

  require(n > 0, "window width must be positive")
  require(evalHashes.length % 2 == 0, "evalHashes must hold (hi, lo) pairs")

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_removed", LongType, nullable = false),
    StructField("clean_text", StringType, nullable = false)))
  override def prettyName: String = "scrub_row_spans"

  /** Binary search over the sorted (hi, lo) pair array (unsigned order —
    * the order [[ScrubFunctions.packHashes]] sorts by). */
  private def contains(hi: Long, lo: Long): Boolean = {
    var l = 0; var r = evalHashes.length / 2 - 1
    while (l <= r) {
      val m = (l + r) >>> 1
      val mh = evalHashes(2 * m); val ml = evalHashes(2 * m + 1)
      val c = {
        val ch = java.lang.Long.compareUnsigned(mh, hi)
        if (ch != 0) ch else java.lang.Long.compareUnsigned(ml, lo)
      }
      if (c == 0) return true
      else if (c < 0) l = m + 1
      else r = m - 1
    }
    false
  }

  def compute(text: UTF8String): InternalRow = {
    val toks = text.toString.split(" ", -1)
    val total = toks.length.toLong
    if (toks.length < n || evalHashes.isEmpty)
      return InternalRow(total, 0L, text.copy())
    val md = MessageDigest.getInstance("MD5")
    val covered = new Array[Boolean](toks.length)
    var i = 0
    var any = false
    while (i + n <= toks.length) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(' '.toByte)
        md.update(toks(i + j).getBytes("UTF-8"))
        j += 1
      }
      val d = md.digest()
      var hi = 0L; var lo = 0L; var b = 0
      while (b < 8) { hi = (hi << 8) | (d(b) & 0xffL); b += 1 }
      while (b < 16) { lo = (lo << 8) | (d(b) & 0xffL); b += 1 }
      if (contains(hi, lo)) {
        any = true
        var k = i
        while (k < i + n) { covered(k) = true; k += 1 }
      }
      i += 1
    }
    if (!any) return InternalRow(total, 0L, text.copy())
    val sb = new java.lang.StringBuilder
    var kept = 0L
    i = 0
    while (i < toks.length) {
      if (!covered(i)) {
        if (kept > 0L) sb.append(' ')
        sb.append(toks(i))
        kept += 1
      }
      i += 1
    }
    InternalRow(total, total - kept, UTF8String.fromString(sb.toString))
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("scrubRowSpans", this, classOf[ScrubRowSpans].getName)
    val irCls = classOf[InternalRow].getName
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = ($irCls) $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): ScrubRowSpans =
    copy(child = newChild)
}

object ScrubFunctions {
  private val counter = new AtomicInteger()

  /** Distinct n-token window md5s of `evalSet` as the packed sorted
    * (hi, lo) array [[ScrubRowSpans]] searches — collected to the driver
    * (bounded by the eval set's distinct window count; see the class
    * doc). Window construction mirrors scrubSpans' starts(). */
  def evalWindowHashes(evalSet: DataFrame, textCol: String, n: Int): Array[Long] = {
    require(n > 0, "window width must be positive")
    val hex = evalSet
      .where(col(textCol).isNotNull)
      .select(split(col(textCol), " ").as("__toks"))
      .where(size(col("__toks")) >= n)
      .select(explode(expr(
        s"CASE WHEN size(__toks) >= $n THEN sequence(1, size(__toks) - ${n - 1}) " +
        "ELSE array() END")).as("s"), col("__toks"))
      .select(md5(expr(s"array_join(slice(__toks, s, $n), ' ')")).as("gh"))
      .distinct()
      .collect().map(_.getString(0))
    val pairs = hex.map { h =>
      (java.lang.Long.parseUnsignedLong(h.substring(0, 16), 16),
        java.lang.Long.parseUnsignedLong(h.substring(16, 32), 16))
    }
    val sorted = pairs.sortWith { case ((ah, al), (bh, bl)) =>
      val c = java.lang.Long.compareUnsigned(ah, bh)
      if (c != 0) c < 0 else java.lang.Long.compareUnsigned(al, bl) < 0
    }
    val out = new Array[Long](sorted.length * 2)
    var i = 0
    while (i < sorted.length) {
      out(2 * i) = sorted(i)._1; out(2 * i + 1) = sorted(i)._2; i += 1
    }
    out
  }

  /** Scoped registration (the [[BloomFunctions.withMightContain]]
    * contract). */
  def withScrub[T](spark: SparkSession, evalHashes: Array[Long], n: Int,
                   text: Column)(build: Column => T): T = {
    val name = s"graft_scrub_rs_${counter.incrementAndGet()}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, children => ScrubRowSpans(children.head, evalHashes, n), "built-in")
    try build(call_function(name, text))
    finally spark.sessionState.catalog.dropTempFunction(name, ignoreIfNotExists = true)
  }
}
