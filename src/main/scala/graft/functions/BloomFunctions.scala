package graft.functions

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/**
 * Codegen'd Bloom-filter membership probe over a pre-built
 * `org.apache.spark.util.sketch.BloomFilter` (the public spark-sketch
 * class `DataFrameStatFunctions.bloomFilter` produces). The filter bits
 * ship once per plan as a reference object — the generated code calls
 * `mightContainLong` directly, so the probe stays inside whole-stage
 * codegen like the other graft expressions (a Scala UDF closure would
 * break the codegen span AND pay boxing per row).
 *
 * The child must be the SAME key form the filter was populated with —
 * [[graft.operators.TextAnalysis.blocklistFilter]] standardizes on
 * `xxhash64(key)` longs on both sides. No false negatives by Bloom
 * construction; false positives at the filter's fpp, which the caller
 * must treat as "maybe" (blocklistFilter confirms them exactly).
 */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomFunctions {
  private val counter = new AtomicInteger()

  /** Build a frame with a `might_contain(bloom, keyExpr)` probe available
    * as a Column. Column→Expression wrapping is private[sql] in Spark 4
    * classic, so the expression is registered as a uniquely-named temp
    * function (the filter captured in the builder closure) and invoked via
    * the public `call_function` — same codegen result, public API only.
    *
    * The registration is SCOPED to `build`: DataFrames analyze eagerly, so
    * by the time the builder returns, `call_function` has resolved into
    * the plan and the registry entry is dead weight — holding it would
    * strongly retain the filter (~1.2 GB at 1B items / 1% fpp) in the
    * session registry FOREVER, an unbounded leak in a long-lived server.
    * The finally-deregistration caps registry growth at zero. */
  def withMightContain[T](spark: SparkSession, bloom: BloomFilter,
                          key: Column)(build: Column => T): T = {
    val name = s"graft_bloom_mc_${counter.incrementAndGet()}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, children => BloomMightContain(children.head, bloom), "built-in")
    try build(call_function(name, key))
    finally spark.sessionState.catalog.dropTempFunction(name, ignoreIfNotExists = true)
  }
}
