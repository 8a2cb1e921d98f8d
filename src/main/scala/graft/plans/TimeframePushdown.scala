package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/**
 * Restores parquet row-group pushdown for timeframe filters over
 * [[graft.ops.Tables.tsToNanos]]-derived columns.
 *
 * The engine's timestamp contract is an opaque epoch-nanos long (reference:
 * frocket/common/validation/query_validator.py:268-299). When the source
 * stores a real TIMESTAMP/TIMESTAMP_NTZ column, the load normalizes it via
 * `unix_micros(cast(c as timestamp)) * 1000` — a projection, so a timeframe
 * filter `ts >= <ns literal>` compares a DERIVED expression and the parquet
 * source sees nothing pushable: at 100 TB that is a full scan where row-group
 * stats should have pruned almost everything.
 *
 * This rule recognizes comparisons of that exact derived shape against long
 * literals inside a Filter and ADDS the equivalent bound on the raw timestamp
 * attribute (exact integer µs conversion — both timestamp types are µs
 * internally, so `us*1000 >= f  ⟺  us >= ceil(f/1000)` etc.). The original
 * predicate is kept (authoritative, and the added bound is pushed into the
 * scan by FileSourceStrategy/V2 pushdown during physical planning). For
 * TIMESTAMP_NTZ the derived value depends on the cast's session timezone, so
 * the rewrite only fires under the engine's pinned UTC reading (Tables.loadRaw
 * sets it); TIMESTAMP is timezone-free in `unix_micros` and always rewrites.
 *
 * Runs inside the operator-optimization fixpoint (injected via
 * [[graft.functions.GraftExtensions]] or `spark.experimental
 * .extraOptimizations`), so it is idempotent: a bound already present as a
 * conjunct is never re-added.
 */
object TimeframePushdown extends Rule[LogicalPlan] {

  /** Overflow-safe ceil division: `a + b - 1` wraps for `a` within `b-1`
    * of Long.MaxValue (an "unbounded" sentinel bound a client can pass),
    * and a wrapped bound conjuncted into the Filter would silently drop
    * every row. floorDiv + remainder-carry never overflows. */
  private def ceilDiv(a: Long, b: Long): Long =
    Math.floorDiv(a, b) + (if (Math.floorMod(a, b) != 0) 1L else 0L)

  private def utcLike(z: String): Boolean =
    z == "UTC" || z == "Etc/UTC" || z == "Z" || z == "+00:00" || z == "GMT"

  /** Matches `unix_micros(cast(raw as timestamp)) * 1000` (the tsToNanos
    * shape) and yields the raw timestamp attribute. */
  private object NanosOfRaw {
    def unapply(e: Expression): Option[AttributeReference] = e match {
      case Multiply(UnixMicros(inner), Literal(1000L, LongType), _) => inner match {
        case a: AttributeReference if a.dataType == TimestampType => Some(a)
        case c: Cast if c.dataType == TimestampType => c.child match {
          case a: AttributeReference if a.dataType == TimestampType => Some(a)
          case a: AttributeReference
            if a.dataType == TimestampNTZType && c.timeZoneId.exists(utcLike) => Some(a)
          case _ => None
        }
        case _ => None
      }
      case _ => None
    }
  }

  /** Micros literal in the raw column's own type (both store µs longs). */
  private def usLit(a: AttributeReference, us: Long): Literal = Literal(us, a.dataType)

  /** Exact µs equivalent of a nanos comparison (us*1000 vs f). */
  private def bound(e: Expression): Option[Expression] = e match {
    case GreaterThanOrEqual(NanosOfRaw(a), Literal(f: Long, LongType)) =>
      Some(GreaterThanOrEqual(a, usLit(a, ceilDiv(f, 1000L))))
    case GreaterThan(NanosOfRaw(a), Literal(f: Long, LongType)) =>
      Some(GreaterThan(a, usLit(a, Math.floorDiv(f, 1000L))))
    case LessThan(NanosOfRaw(a), Literal(f: Long, LongType)) =>
      Some(LessThan(a, usLit(a, ceilDiv(f, 1000L))))
    case LessThanOrEqual(NanosOfRaw(a), Literal(f: Long, LongType)) =>
      Some(LessThanOrEqual(a, usLit(a, Math.floorDiv(f, 1000L))))
    // Literal-on-left mirrors (f OP nanos ⟺ nanos OP' f).
    case GreaterThanOrEqual(Literal(f: Long, LongType), NanosOfRaw(a)) =>
      Some(LessThanOrEqual(a, usLit(a, Math.floorDiv(f, 1000L))))
    case GreaterThan(Literal(f: Long, LongType), NanosOfRaw(a)) =>
      Some(LessThan(a, usLit(a, ceilDiv(f, 1000L))))
    case LessThan(Literal(f: Long, LongType), NanosOfRaw(a)) =>
      Some(GreaterThan(a, usLit(a, Math.floorDiv(f, 1000L))))
    case LessThanOrEqual(Literal(f: Long, LongType), NanosOfRaw(a)) =>
      Some(GreaterThanOrEqual(a, usLit(a, ceilDiv(f, 1000L))))
    case _ => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case o         => Seq(o)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val cs = conjuncts(cond)
      val extras = cs.flatMap(bound)
        .filterNot(b => cs.exists(_.semanticEquals(b)))
      if (extras.isEmpty) f
      else Filter((cs ++ extras).reduce(And), child)
  }
}
