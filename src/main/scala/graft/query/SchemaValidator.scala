package graft.query

import org.apache.spark.sql.types._

import QueryAst._

/**
 * Dataset-aware validation — the reference's second validation phase
 * (frocket/common/validation/query_validator.py:176-229,268-299): after the
 * pure JSON/shape checks in [[QueryParser]], verify the query against the
 * dataset's schema:
 *
 *  - every referenced column exists and is a supported type;
 *  - the operator/value matches the column type
 *    (OPERATORS_BY_COLTYPE / VALUE_TYPES_BY_COLTYPE, validation/consts.py:54-66);
 *  - sum-target and sumPerValue/meanPerValue measure columns are numeric;
 *  - timeframe bounds have the same digit count as the dataset's timestamp
 *    range — the reference's scale-agnostic sanity check (a seconds-scale
 *    bound against a millis-scale column is almost certainly a bug).
 *
 * Also computes `usedColumns` (reference query_validator.py:176-203) so
 * callers can `select` early; Catalyst prunes anyway, but the narrowed frame
 * keeps every downstream plan's ReadSchema minimal even through
 * non-prunable custom steps.
 */
object SchemaValidator {

  /** Spark type → reference 4-type classification for operator checks. */
  private def colKind(dt: DataType): Option[String] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some("int")
    case FloatType | DoubleType                        => Some("float")
    case _: DecimalType                                => Some("float")
    case BooleanType                                   => Some("bool")
    case StringType                                    => Some("string")
    case _                                             => None
  }

  private val numericOps: Set[FilterOp] = FilterOp.numeric
  private val boolOps: Set[FilterOp]    = FilterOp.boolOps
  private val stringOps: Set[FilterOp]  = FilterOp.string

  def validate(schema: StructType, spec: graft.engine.DatasetSpec, q: GraftQuery): Unit = {
    def kindOf(c: String, context: String): String = {
      val f = schema.find(_.name == c).getOrElse(
        fail("schema", s"$context references unknown column '$c'"))
      colKind(f.dataType).getOrElse(
        fail("type", s"$context references unsupported-type column '$c' (${f.dataType.simpleString})"))
    }

    def checkFilter(f: RowFilter, context: String): Unit = {
      val kind = kindOf(f.column, context)
      val opOk = kind match {
        case "int" | "float" => numericOps.contains(f.op)
        case "bool"          => boolOps.contains(f.op)
        case "string"        => stringOps.contains(f.op)
      }
      if (!opOk)
        fail("type", s"$context: operator '${f.op.token}' not valid for $kind column '${f.column}'")
      val valueOk = (kind, f.value) match {
        case ("int" | "float", Scalar.Num(_)) => true
        case ("bool", Scalar.Bool(_))         => true
        case ("string", Scalar.Str(_))        => true
        case _                                => false
      }
      if (!valueOk)
        fail("type", s"$context: value ${f.value} not valid for $kind column '${f.column}'")
    }

    def checkSteps(steps: Seq[SequenceStep], context: String): Unit =
      steps.zipWithIndex.foreach { case (s, i) =>
        s.filters.foreach(checkFilter(_, s"$context step $i"))
      }

    def checkAgg(a: Aggregation, context: String): Unit = {
      kindOf(a.column, context)
      a.otherColumn.foreach { oc =>
        val k = kindOf(oc, context)
        if (k != "int" && k != "float")
          fail("type", s"$context: otherColumn '$oc' must be numeric, is $k")
      }
    }

    kindOf(spec.groupIdColumn, "dataset groupId") match {
      case "int" | "string" => ()
      case k => fail("type", s"group id column '${spec.groupIdColumn}' must be int or string, is $k")
    }
    kindOf(spec.timestampColumn, "dataset timestamp") match {
      case "int" | "float" => ()
      case k => fail("type", s"timestamp column '${spec.timestampColumn}' must be numeric, is $k")
    }

    q.conditions.zipWithIndex.foreach {
      case (Condition.Filters(_, filters, target, _), i) =>
        filters.foreach(checkFilter(_, s"condition $i"))
        target match {
          case Target.Sum(c, _, _) =>
            val k = kindOf(c, s"condition $i sum target")
            if (k != "int" && k != "float")
              fail("type", s"condition $i: sum target column '$c' must be numeric, is $k")
          case _ => ()
        }
      case (Condition.Sequence(_, steps, _), i) => checkSteps(steps, s"condition $i")
    }
    q.aggregations.foreach(checkAgg(_, "aggregation"))
    q.funnel.foreach { f =>
      checkSteps(f.steps, "funnel")
      (f.stepAggregations ++ f.endAggregations).foreach(checkAgg(_, "funnel aggregation"))
    }
  }

  /** Reference timeframe scale check (query_validator.py:268-299): bounds
    * must have the same decimal digit count as the dataset's timestamps. */
  def validateTimeframeScale(q: GraftQuery, minTs: Double, maxTs: Double): Unit =
    q.timeframe.foreach { tf =>
      val dataDigits = math.max(digits(minTs.toLong), digits(maxTs.toLong))
      (tf.from ++ tf.to).foreach { b =>
        if (b != 0 && digits(b) != dataDigits)
          fail("type",
            s"timeframe bound $b has ${digits(b)} digits but dataset timestamps have " +
            s"$dataDigits — mismatched timestamp scale?")
      }
    }

  /** All columns the query touches (reference used_columns) plus the group
    * id and timestamp columns. */
  def usedColumns(spec: graft.engine.DatasetSpec, q: GraftQuery): Seq[String] = {
    val fromConds = q.conditions.flatMap {
      case Condition.Filters(_, filters, target, _) =>
        filters.map(_.column) ++ (target match {
          case Target.Sum(c, _, _) => Seq(c)
          case _                   => Nil
        })
      case Condition.Sequence(_, steps, _) => steps.flatMap(_.filters.map(_.column))
    }
    val fromAggs = (q.aggregations ++
      q.funnel.toSeq.flatMap(f => f.stepAggregations ++ f.endAggregations))
      .flatMap(a => a.column +: a.otherColumn.toSeq)
    val fromFunnel = q.funnel.toSeq.flatMap(_.steps.flatMap(_.filters.map(_.column)))
    (Seq(spec.groupIdColumn, spec.timestampColumn) ++
      fromConds ++ fromAggs ++ fromFunnel).distinct
  }

  private def digits(n: Long): Int = math.abs(n).toString.length

  private def fail(kind: String, msg: String): Nothing =
    throw QueryValidationException(kind, msg)
}
