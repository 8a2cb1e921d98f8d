package graft.query

import org.json4s._
import org.json4s.jackson.JsonMethods

import QueryAst._

/** A query that failed validation; `kind` loosely mirrors the reference's
  * ValidationErrorKind (schema / type mismatch / relation). */
final case class QueryValidationException(kind: String, message: String)
    extends RuntimeException(s"[$kind] $message")

/**
 * JSON → expanded [[QueryAst.GraftQuery]].
 *
 * Implements the reference's validation + expansion pipeline (semantics from
 * frocket/common/validation/query_validator.py and visitor_functions.py):
 *
 *  - shorthand filter `["col","op",value]` → verbose `{column,op,value}`
 *  - shorthand target `["count",">",5]` / `["sum","col",">=",9.9]` → verbose
 *  - missing target on a filter condition → default `count >= 1`
 *  - includeZero validity matrix + auto-set for `count == 0`
 *  - aggregations without `type` → expand to [count, countPerValue,
 *    groupsPerValue]; named multi-expansion rejected
 *  - condition name uniqueness + identifier validity; relation parse
 */
object QueryParser {

  def parse(json: String): GraftQuery = parse(JsonMethods.parse(json))

  def parse(root: JValue): GraftQuery = {
    root match {
      case _: JObject => ()
      case _          => fail("schema", "Query root must be a JSON object")
    }
    val knownTop = Set("query", "funnel", "timeframe")
    root.asInstanceOf[JObject].obj.foreach { case (k, _) =>
      if (!knownTop.contains(k)) fail("schema", s"Unknown top-level key '$k'")
    }

    val timeframe = root \ "timeframe" match {
      case JNothing | JNull => None
      case tf: JObject =>
        tf.obj.foreach { case (k, _) =>
          if (k != "from" && k != "to") fail("schema", s"Unknown timeframe key '$k'")
        }
        val from = optLong(tf \ "from", "timeframe.from")
        val to   = optLong(tf \ "to", "timeframe.to")
        (from, to) match {
          case (None, None) => None
          case _ =>
            for (f <- from; t <- to) if (t < f) fail("schema", "timeframe.to < timeframe.from")
            Some(Timeframe(from, to))
        }
      case _ => fail("schema", "timeframe must be an object")
    }

    val queryObj = root \ "query" match {
      case JNothing | JNull => JObject()
      case o: JObject =>
        o.obj.foreach { case (k, _) =>
          if (!Set("relation", "conditions", "aggregations").contains(k))
            fail("schema", s"Unknown query key '$k'")
        }
        o
      case _ => fail("schema", "'query' must be an object")
    }

    val conditions = queryObj \ "conditions" match {
      case JNothing | JNull => Nil
      case JArray(items)    => items.map(parseCondition)
      case _                => fail("schema", "query.conditions must be an array")
    }

    // Condition names: valid identifiers, unique (case-insensitive), resolvable.
    val names: Map[String, Int] = {
      val pairs = conditions.zipWithIndex.collect { case (c, i) if c.name.isDefined =>
        val n = c.name.get.trim
        if (!RelationParser.isValidIdentifier(n))
          fail("schema", s"Condition name '$n' is not a valid identifier")
        n.toLowerCase -> i
      }
      val dup = pairs.groupBy(_._1).collect { case (n, v) if v.size > 1 => n }
      if (dup.nonEmpty) fail("schema", s"Duplicate condition name(s): ${dup.mkString(", ")}")
      pairs.toMap
    }

    val relation = queryObj \ "relation" match {
      case JNothing | JNull => None
      case JString(s) if s.trim.isEmpty => None
      case JString(s) =>
        // Bare "and"/"or" means: that operator over ALL conditions (reference
        // RELATION_OPS usage with DEFAULT_RELATION_OP='and').
        val t = s.trim.toLowerCase
        if (t == "and" || t == "&&") None // AND over all == default
        else if (t == "or" || t == "||") {
          if (conditions.isEmpty) None
          else Some((1 until conditions.size).foldLeft[Relation](Relation.Ref(0)) {
            (acc, i) => Relation.Or(acc, Relation.Ref(i))
          })
        } else
          RelationParser.parse(s.trim, conditions.size, names) match {
            // Canonicalize the EXPRESSION form of the default relation
            // (r14): "$0 and $1" (or named refs) ANDing every condition is
            // semantically identical to the bare "and" normalized above —
            // fold it to None too, so the engine's fast-path routing
            // (gated on relation.isEmpty, QueryEngine §"Fast-path
            // routing") sees through the spelling instead of pinning the
            // window plan on HTTP queries that spell the default out.
            // AND is idempotent, so duplicate refs don't block the fold;
            // any Or node or an unreferenced condition keeps the
            // expression (a partial AND restricts to a SUBSET and is NOT
            // the default, which ANDs all conditions).
            case Right(r) if isCompleteAnd(r, conditions.size) => None
            case Right(r)  => Some(r)
            case Left(err) => fail("relation", err)
          }
      case _ => fail("schema", "query.relation must be a string")
    }

    val aggregations = parseAggregations(queryObj \ "aggregations", "query.aggregations")

    val funnel = root \ "funnel" match {
      case JNothing | JNull => None
      case f: JObject =>
        f.obj.foreach { case (k, _) =>
          if (!Set("sequence", "maxDuration", "stepAggregations", "endAggregations").contains(k))
            fail("schema", s"Unknown funnel key '$k'")
        }
        val steps = f \ "sequence" match {
          case JArray(items) if items.nonEmpty => items.map(parseStep)
          case _ => fail("schema", "funnel.sequence must be a non-empty array")
        }
        Some(Funnel(
          steps,
          maxDuration = optLong(f \ "maxDuration", "funnel.maxDuration"),
          stepAggregations = parseAggregations(f \ "stepAggregations", "funnel.stepAggregations"),
          endAggregations  = parseAggregations(f \ "endAggregations", "funnel.endAggregations")))
      case _ => fail("schema", "'funnel' must be an object")
    }

    GraftQuery(timeframe, conditions, relation, aggregations, funnel)
  }

  /** True iff `r` is a pure AND tree referencing EVERY one of the `n`
    * conditions (duplicates allowed — AND is idempotent): the expression
    * spelling of the default relation. Ref indices are parser-validated
    * to be < n, so covering n distinct indices means covering all. */
  private def isCompleteAnd(r: Relation, n: Int): Boolean = {
    val refs = scala.collection.mutable.Set.empty[Int]
    def walk(x: Relation): Boolean = x match {
      case Relation.Ref(i)    => refs += i; true
      case Relation.And(l, q) => walk(l) && walk(q)
      case _: Relation.Or     => false
    }
    walk(r) && refs.size == n
  }

  // ---------------------------------------------------------------- conditions

  private def parseCondition(j: JValue): Condition = j match {
    case o: JObject =>
      val keys = o.obj.map(_._1).toSet
      val name = o \ "name" match {
        case JString(s)       => Some(s)
        case JNothing | JNull => None
        case _                => fail("schema", "condition name must be a string")
      }
      if (keys.contains("sequence")) {
        val bad = keys -- Set("name", "sequence", "maxDuration")
        if (bad.nonEmpty) fail("schema", s"Unknown sequence-condition key(s): ${bad.mkString(",")}")
        val steps = o \ "sequence" match {
          case JArray(items) if items.nonEmpty => items.map(parseStep)
          case _ => fail("schema", "sequence must be a non-empty array")
        }
        Condition.Sequence(name, steps, optLong(o \ "maxDuration", "maxDuration"))
      } else if (keys.contains("filter") || keys.contains("filters")) {
        val bad = keys -- Set("name", "filter", "filters", "target", "includeZero")
        if (bad.nonEmpty) fail("schema", s"Unknown condition key(s): ${bad.mkString(",")}")
        if (keys.contains("filter") && keys.contains("filters"))
          fail("schema", "Condition cannot have both 'filter' and 'filters'")
        val filters =
          if (keys.contains("filter")) Seq(parseFilter(o \ "filter"))
          else o \ "filters" match {
            case JArray(items) if items.nonEmpty => items.map(parseFilter)
            case _ => fail("schema", "'filters' must be a non-empty array")
          }
        val target = o \ "target" match {
          case JNothing | JNull => Target.Count(CmpOp.Gte, 1) // DEFAULT_TARGET
          case t                => parseTarget(t)
        }
        val includeZeroRaw = o \ "includeZero" match {
          case JBool(b)         => Some(b)
          case JNothing | JNull => None
          case _                => fail("schema", "includeZero must be a boolean")
        }
        Condition.Filters(name, filters, target, resolveIncludeZero(target, includeZeroRaw))
      } else fail("schema", s"Condition must have 'filter', 'filters' or 'sequence': ${JsonMethods.compact(o)}")
    case _ => fail("schema", "Condition must be an object")
  }

  /** The includeZero truth table (reference visitor_functions.py:91-143). */
  private def resolveIncludeZero(target: Target, raw: Option[Boolean]): Boolean = target match {
    case Target.Sum(_, _, _) =>
      if (raw.contains(true)) fail("type", "'includeZero' is not applicable for target type 'sum'")
      false
    case Target.Count(op, value) =>
      if (value < 0) fail("schema", "count target value must be >= 0")
      raw match {
        case Some(true) =>
          if (op == CmpOp.Lt && value == 0)
            fail("type", "Target implies a negative value")
          if ((op == CmpOp.Neq && value == 0) ||
              ((op == CmpOp.Eq || op == CmpOp.Gte) && value != 0) ||
              op == CmpOp.Gt)
            fail("type", s"Target count ${op.token} $value precludes zero; 'includeZero' cannot be true")
          true
        case Some(false) =>
          if (op == CmpOp.Eq && value == 0)
            fail("type", "When target is count == 0, 'includeZero' cannot be false")
          false
        case None => op == CmpOp.Eq && value == 0 // auto-set for count == 0
      }
  }

  private def parseStep(j: JValue): SequenceStep = j match {
    case o: JObject =>
      val keys = o.obj.map(_._1).toSet
      val bad = keys -- Set("filter", "filters", "rowFound")
      if (bad.nonEmpty) fail("schema", s"Unknown sequence-step key(s): ${bad.mkString(",")}")
      val filters =
        if (keys.contains("filter")) Seq(parseFilter(o \ "filter"))
        else o \ "filters" match {
          case JArray(items) if items.nonEmpty => items.map(parseFilter)
          case _ => fail("schema", "Sequence step needs 'filter' or non-empty 'filters'")
        }
      val rowFound = o \ "rowFound" match {
        case JBool(b)         => b
        case JNothing | JNull => true
        case _                => fail("schema", "rowFound must be a boolean")
      }
      SequenceStep(filters, rowFound)
    case _ => fail("schema", "Sequence step must be an object")
  }

  private def parseFilter(j: JValue): RowFilter = j match {
    case JArray(List(JString(col), JString(op), v)) => mkFilter(col, op, v)
    case o: JObject =>
      val keys = o.obj.map(_._1).toSet
      if (keys != Set("column", "op", "value"))
        fail("schema", s"Filter object must have exactly column/op/value, got ${keys.mkString(",")}")
      (o \ "column", o \ "op") match {
        case (JString(col), JString(op)) => mkFilter(col, op, o \ "value")
        case _ => fail("schema", "Filter column and op must be strings")
      }
    case _ => fail("schema", s"Filter must be [col,op,value] or {column,op,value}: ${JsonMethods.compact(j)}")
  }

  private def mkFilter(col: String, op: String, v: JValue): RowFilter = {
    val fop = FilterOp.parse(op).fold(m => fail("schema", m), identity)
    val value = v match {
      case JString(s)  => Scalar.Str(s)
      case JInt(i)     => Scalar.Num(BigDecimal(i))
      case JLong(l)    => Scalar.Num(BigDecimal(l))
      case JDouble(d)  => Scalar.Num(BigDecimal(d))
      case JDecimal(d) => Scalar.Num(d)
      case JBool(b)    => Scalar.Bool(b)
      case _           => fail("schema", s"Filter value must be string/number/boolean, got ${JsonMethods.compact(v)}")
    }
    (fop, value) match {
      case (FilterOp.Contains | FilterOp.NotContains | FilterOp.Regex, Scalar.Str(_)) => ()
      case (FilterOp.Contains | FilterOp.NotContains | FilterOp.Regex, _) =>
        fail("type", s"Operator '${fop.token}' requires a string value")
      case _ => ()
    }
    RowFilter(col, fop, value)
  }

  private def parseTarget(j: JValue): Target = j match {
    case JArray(List(JString("count"), JString(op), v)) =>
      Target.Count(cmp(op), requireLong(v, "count target value"))
    case JArray(List(JString("sum"), JString(col), JString(op), v)) =>
      Target.Sum(col, cmp(op), requireNum(v, "sum target value"))
    case o: JObject =>
      (o \ "type") match {
        case JString("count") =>
          Target.Count(cmpJ(o \ "op"), requireLong(o \ "value", "count target value"))
        case JString("sum") =>
          val col = o \ "column" match {
            case JString(c) => c
            case _          => fail("schema", "sum target requires 'column'")
          }
          Target.Sum(col, cmpJ(o \ "op"), requireNum(o \ "value", "sum target value"))
        case _ => fail("schema", s"Unknown target type in ${JsonMethods.compact(o)}")
      }
    case _ => fail("schema", s"Bad target: ${JsonMethods.compact(j)}")
  }

  // ---------------------------------------------------------------- aggregations

  private def parseAggregations(j: JValue, path: String): Seq[Aggregation] = j match {
    case JNothing | JNull => Nil
    case JArray(items)    =>
      val parsed = items.flatMap(a => parseAggregation(a, path))
      val named = parsed.flatMap(_.name).map(_.toLowerCase)
      if (named.distinct.size != named.size)
        fail("schema", s"Duplicate aggregation names in $path")
      parsed
    case _ => fail("schema", s"$path must be an array")
  }

  /** No `type` → expand to default triple (reference DEFAULT_AGGREGATIONS). */
  private def parseAggregation(j: JValue, path: String): Seq[Aggregation] = j match {
    case o: JObject =>
      val keys = o.obj.map(_._1).toSet
      val bad = keys -- Set("name", "column", "type", "otherColumn", "top")
      if (bad.nonEmpty) fail("schema", s"Unknown aggregation key(s) in $path: ${bad.mkString(",")}")
      val column = o \ "column" match {
        case JString(c) => c
        case _          => fail("schema", s"Aggregation in $path requires 'column'")
      }
      val name = o \ "name" match {
        case JString(s)       => Some(s)
        case JNothing | JNull => None
        case _                => fail("schema", "aggregation name must be a string")
      }
      name.foreach { n =>
        if (!RelationParser.isValidIdentifier(n.trim))
          fail("schema", s"Aggregation name '$n' is not a valid identifier")
      }
      val other = o \ "otherColumn" match {
        case JString(c)       => Some(c)
        case JNothing | JNull => None
        case _                => fail("schema", "otherColumn must be a string")
      }
      // `top` is an extension knob (reference only has a global config default).
      val top = optLong(o \ "top", "aggregation top").map(_.toInt).getOrElse(Aggregation.DefaultTop)
      o \ "type" match {
        case JString(t) =>
          val at = AggType.parse(t).fold(m => fail("schema", m), identity)
          val needsOther = AggType.withOtherColumn.contains(at)
          if (needsOther && other.isEmpty)
            fail("schema", s"Aggregation type '$t' requires otherColumn")
          if (!needsOther && other.nonEmpty)
            fail("schema", s"Aggregation type '$t' does not take otherColumn")
          Seq(Aggregation(name, column, at, if (needsOther) other else None, top))
        case JNothing | JNull =>
          if (name.nonEmpty)
            fail("schema", "Aggregation expanding into multiple defaults cannot have a name")
          if (other.nonEmpty)
            fail("schema", "Aggregation without a type cannot have otherColumn")
          Seq(AggType.Count, AggType.CountPerValue, AggType.GroupsPerValue)
            .map(t => Aggregation(None, column, t, None, top))
        case _ => fail("schema", "aggregation type must be a string")
      }
    case _ => fail("schema", s"Aggregation in $path must be an object")
  }

  // ---------------------------------------------------------------- helpers

  private def cmp(op: String): CmpOp = CmpOp.parse(op).fold(m => fail("schema", m), identity)
  private def cmpJ(j: JValue): CmpOp = j match {
    case JString(s) => cmp(s)
    case _          => fail("schema", "target op must be a string")
  }

  private def requireLong(j: JValue, what: String): Long = j match {
    case JInt(i)  => i.toLong
    case JLong(l) => l
    case _        => fail("schema", s"$what must be an integer")
  }

  private def requireNum(j: JValue, what: String): BigDecimal = j match {
    case JInt(i)     => BigDecimal(i)
    case JLong(l)    => BigDecimal(l)
    case JDouble(d)  => BigDecimal(d)
    case JDecimal(d) => d
    case _           => fail("schema", s"$what must be a number")
  }

  private def optLong(j: JValue, what: String): Option[Long] = j match {
    case JNothing | JNull => None
    case JInt(i)          => Some(i.toLong)
    case JLong(l)         => Some(l)
    case _                => fail("schema", s"$what must be an integer")
  }

  private def fail(kind: String, msg: String): Nothing =
    throw QueryValidationException(kind, msg)
}
