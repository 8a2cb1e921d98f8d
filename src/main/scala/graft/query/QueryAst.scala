package graft.query

/**
 * Canonical (expanded) query AST — the Scala mirror of the reference's JSON
 * query language (reference: frocket/resources/query_schema.json, expansion
 * semantics in frocket/common/validation/visitor_functions.py).
 *
 * The parser ([[QueryParser]]) accepts both shorthand and verbose JSON forms
 * and always produces this fully-expanded form (verbose filters, explicit
 * default target `count >= 1`, explicit includeZero, expanded default
 * aggregations), so the planner never deals with sugar.
 */
object QueryAst {

  /** Row-level filter operators. `Regex` is a declared extension beyond the
    * reference engine (its consts list `regex` but the engine never
    * implements it — see SURVEY.md §2.2). */
  sealed abstract class FilterOp(val token: String)
  object FilterOp {
    case object Eq          extends FilterOp("==")
    case object Neq         extends FilterOp("!=")
    case object Gt          extends FilterOp(">")
    case object Gte         extends FilterOp(">=")
    case object Lt          extends FilterOp("<")
    case object Lte         extends FilterOp("<=")
    case object Contains    extends FilterOp("contains")
    case object NotContains extends FilterOp("not contains")
    case object Regex       extends FilterOp("regex")

    val all: Seq[FilterOp] = Seq(Eq, Neq, Gt, Gte, Lt, Lte, Contains, NotContains, Regex)
    def parse(s: String): Either[String, FilterOp] =
      all.find(_.token == s).toRight(s"Unknown filter operator '$s'")

    val numeric: Set[FilterOp] = Set(Eq, Neq, Gt, Gte, Lt, Lte)
    val boolOps: Set[FilterOp] = Set(Eq, Neq)
    val string:  Set[FilterOp] = Set(Eq, Neq, Contains, NotContains, Regex)
  }

  /** Scalar literal in a filter (the query language has exactly these three
    * value kinds; reference query_schema.json `anyValue`). */
  sealed trait Scalar
  object Scalar {
    final case class Num(v: BigDecimal) extends Scalar
    final case class Str(v: String)     extends Scalar
    final case class Bool(v: Boolean)   extends Scalar
  }

  /** `{column, op, value}` — one row-level predicate. */
  final case class RowFilter(column: String, op: FilterOp, value: Scalar)

  /** Numeric comparison operator used by condition targets. */
  sealed abstract class CmpOp(val token: String)
  object CmpOp {
    case object Eq  extends CmpOp("==")
    case object Neq extends CmpOp("!=")
    case object Gt  extends CmpOp(">")
    case object Gte extends CmpOp(">=")
    case object Lt  extends CmpOp("<")
    case object Lte extends CmpOp("<=")
    val all: Seq[CmpOp] = Seq(Eq, Neq, Gt, Gte, Lt, Lte)
    def parse(s: String): Either[String, CmpOp] =
      all.find(_.token == s).toRight(s"Unknown target operator '$s'")
  }

  /** Group-level target of a filter condition. */
  sealed trait Target
  object Target {
    /** count of rows matching the condition's filters, compared to value. */
    final case class Count(op: CmpOp, value: Long) extends Target
    /** sum of `column` over rows matching the filters, compared to value. */
    final case class Sum(column: String, op: CmpOp, value: BigDecimal) extends Target
  }

  /** One step of a sequence/funnel: a conjunction of filters; `rowFound =
    * false` (extension — schema'd but unimplemented in the reference) means
    * the step must NOT have happened. */
  final case class SequenceStep(filters: Seq[RowFilter], rowFound: Boolean = true)

  /** A condition: either row-filters + group target, or an ordered sequence. */
  sealed trait Condition { def name: Option[String] }
  object Condition {
    final case class Filters(
        name: Option[String],
        filters: Seq[RowFilter],
        target: Target,
        includeZero: Boolean) extends Condition

    /** `maxDuration` (extension): last-step ts − first-step ts must be <= d. */
    final case class Sequence(
        name: Option[String],
        steps: Seq[SequenceStep],
        maxDuration: Option[Long]) extends Condition
  }

  /** Parsed `relation` boolean expression over condition indices. */
  sealed trait Relation
  object Relation {
    final case class Ref(conditionIndex: Int)        extends Relation
    final case class And(l: Relation, r: Relation)   extends Relation
    final case class Or(l: Relation, r: Relation)    extends Relation
  }

  sealed abstract class AggType(val token: String)
  object AggType {
    case object Count          extends AggType("count")
    case object CountPerValue  extends AggType("countPerValue")
    case object GroupsPerValue extends AggType("groupsPerValue")
    case object SumPerValue    extends AggType("sumPerValue")
    case object MeanPerValue   extends AggType("meanPerValue")
    val all: Seq[AggType] = Seq(Count, CountPerValue, GroupsPerValue, SumPerValue, MeanPerValue)
    def parse(s: String): Either[String, AggType] =
      all.find(_.token == s).toRight(s"Unknown aggregation type '$s'")
    /** types requiring `otherColumn` (reference consts.py AGGR_TYPES_WITH_OTHER_COLUMN) */
    val withOtherColumn: Set[AggType] = Set(SumPerValue, MeanPerValue)
  }

  /** One aggregation request; `top` bounds per-value result size (default 10,
    * reference config `aggregations.top.default.count`). */
  final case class Aggregation(
      name: Option[String],
      column: String,
      atype: AggType,
      otherColumn: Option[String],
      top: Int = Aggregation.DefaultTop)
  object Aggregation { val DefaultTop = 10 }

  final case class Funnel(
      steps: Seq[SequenceStep],
      maxDuration: Option[Long],
      stepAggregations: Seq[Aggregation],
      endAggregations: Seq[Aggregation])

  /** Static event-time bounds: ts >= from && ts < to (reference: timeframe). */
  final case class Timeframe(from: Option[Long], to: Option[Long])

  /** The whole expanded query. `relation = None` means AND over all conditions. */
  final case class GraftQuery(
      timeframe: Option[Timeframe],
      conditions: Seq[Condition],
      relation: Option[Relation],
      aggregations: Seq[Aggregation],
      funnel: Option[Funnel]) {
    def isEmpty: Boolean = conditions.isEmpty && aggregations.isEmpty && funnel.isEmpty
  }
  object GraftQuery {
    val empty: GraftQuery = GraftQuery(None, Nil, None, Nil, None)
  }
}
