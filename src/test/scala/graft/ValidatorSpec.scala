package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.DatasetSpec
import graft.query.QueryAst._
import graft.query.{QueryParser, QueryValidationException, SchemaValidator}

/** Validator matrix, ported from the reference's test_query_validator.py:
  * shorthand expansion, includeZero truth table, relation grammar,
  * aggregation expansion, plus the dataset-aware phase (column existence,
  * operator/type matrix, timeframe scale). Pure Scala — no SparkSession. */
class ValidatorSpec extends AnyFunSuite {

  private def parse(json: String): GraftQuery = QueryParser.parse(json)
  private def rejects(json: String, kindHint: String = ""): QueryValidationException = {
    val e = intercept[QueryValidationException](parse(json))
    if (kindHint.nonEmpty) assert(e.kind == kindHint, e.getMessage)
    e
  }

  // ------------------------------------------------------ shorthand expansion

  test("shorthand filter and target expand to verbose form") {
    val q = parse("""{"query":{"conditions":[
      |{"filter":["price",">",100],"target":["count",">=",5]}]}}""".stripMargin)
    val c = q.conditions.head.asInstanceOf[Condition.Filters]
    assert(c.filters == Seq(RowFilter("price", FilterOp.Gt, Scalar.Num(100))))
    assert(c.target == Target.Count(CmpOp.Gte, 5))
  }

  test("shorthand sum target") {
    val q = parse("""{"query":{"conditions":[
      |{"filter":["t","==","x"],"target":["sum","price",">=",9.5]}]}}""".stripMargin)
    assert(q.conditions.head.asInstanceOf[Condition.Filters].target ==
      Target.Sum("price", CmpOp.Gte, BigDecimal(9.5)))
  }

  test("missing target defaults to count >= 1") {
    val q = parse("""{"query":{"conditions":[{"filter":["t","==","x"]}]}}""")
    assert(q.conditions.head.asInstanceOf[Condition.Filters].target ==
      Target.Count(CmpOp.Gte, 1))
  }

  // ------------------------------------------------------ includeZero matrix
  // (reference visitor_functions.py:91-143 / test_query_validator.py:243-284)

  private def qz(target: String, includeZero: Option[Boolean]): String = {
    val iz = includeZero.map(b => s""","includeZero":$b""").getOrElse("")
    s"""{"query":{"conditions":[{"filter":["t","==","x"],"target":$target$iz}]}}"""
  }
  private def izOf(json: String): Boolean =
    parse(json).conditions.head.asInstanceOf[Condition.Filters].includeZero

  test("includeZero auto-set for count == 0") {
    assert(izOf(qz("""["count","==",0]""", None)))
  }
  test("includeZero=false with count == 0 rejected") {
    intercept[QueryValidationException](parse(qz("""["count","==",0]""", Some(false))))
  }
  test("includeZero=true with count > 0 rejected (zero precluded)") {
    intercept[QueryValidationException](parse(qz("""["count",">",0]""", Some(true))))
    intercept[QueryValidationException](parse(qz("""["count",">=",2]""", Some(true))))
    intercept[QueryValidationException](parse(qz("""["count","==",3]""", Some(true))))
    intercept[QueryValidationException](parse(qz("""["count","!=",0]""", Some(true))))
  }
  test("includeZero=true valid for <=, <, != k, == 0") {
    assert(izOf(qz("""["count","<=",3]""", Some(true))))
    assert(izOf(qz("""["count","<",3]""", Some(true))))
    assert(izOf(qz("""["count","==",0]""", Some(true))))
  }
  test("includeZero not applicable for sum targets") {
    intercept[QueryValidationException](
      parse(qz("""["sum","price",">",5]""", Some(true))))
  }
  test("count < 0 target implies negative — rejected") {
    intercept[QueryValidationException](parse(qz("""["count","<",0]""", Some(true))))
  }

  // ------------------------------------------------------ relation grammar

  private def rel(relation: String, n: Int = 3): Option[Relation] =
    parse(s"""{"query":{"relation":"$relation","conditions":[
      |{"name":"a","filter":["t","==","x"]},
      |{"name":"b","filter":["t","==","y"]},
      |{"name":"c","filter":["t","==","z"]}]}}""".stripMargin).relation

  test("relation: index refs, name refs, parens, and/or") {
    assert(rel("$0 and $1").contains(Relation.And(Relation.Ref(0), Relation.Ref(1))))
    assert(rel("$a or $b").contains(Relation.Or(Relation.Ref(0), Relation.Ref(1))))
    assert(rel("($0 and $1) or $c").contains(
      Relation.Or(Relation.And(Relation.Ref(0), Relation.Ref(1)), Relation.Ref(2))))
    assert(rel("$0 && $1 || $2").nonEmpty)
  }
  test("relation: bare and/or apply to all conditions") {
    assert(rel("and").isEmpty) // AND-over-all == default
    assert(rel("or").contains(
      Relation.Or(Relation.Or(Relation.Ref(0), Relation.Ref(1)), Relation.Ref(2))))
  }
  test("relation: expression-form complete AND canonicalizes to None (r14)") {
    // "$0 and $1 and $2" over exactly 3 conditions IS the default relation
    // — the parser folds it to None (like bare "and") so the engine's
    // fast-path routing sees through the spelling. Partial ANDs ("$0 and
    // $1" over 3 — tested above to survive) and any OR are NOT folded.
    assert(rel("$0 and $1 and $2").isEmpty)
    assert(rel("$a and $b and $c").isEmpty)      // named refs
    assert(rel("($0 and $1) and $c").isEmpty)    // parens, mixed ref styles
    assert(rel("$0 and $0 and $1 and $2").isEmpty) // duplicate ref — AND idempotent
    assert(rel("$0 && $1 && $2").isEmpty)        // && spelling
    assert(rel("($0 and $1) or $2").nonEmpty)    // OR keeps the expression
    assert(rel("$0 and ($1 or $2)").nonEmpty)
  }
  test("relation: unknown name / out-of-range index / garbage rejected") {
    intercept[QueryValidationException](rel("$nope and $a"))
    intercept[QueryValidationException](rel("$9 and $0"))
    intercept[QueryValidationException](rel("$0 banana $1"))
  }
  test("duplicate condition names rejected (case-insensitive)") {
    rejects("""{"query":{"conditions":[
      |{"name":"A","filter":["t","==","x"]},
      |{"name":"a","filter":["t","==","y"]}]}}""".stripMargin)
  }

  // ------------------------------------------------------ aggregation expansion

  test("aggregation without type expands to default triple") {
    val q = parse("""{"query":{"aggregations":[{"column":"cat"}]}}""")
    assert(q.aggregations.map(_.atype) ==
      Seq(AggType.Count, AggType.CountPerValue, AggType.GroupsPerValue))
  }
  test("otherColumn required for sumPerValue, rejected for countPerValue") {
    rejects("""{"query":{"aggregations":[{"column":"c","type":"sumPerValue"}]}}""")
    rejects("""{"query":{"aggregations":[{"column":"c","type":"countPerValue","otherColumn":"x"}]}}""")
  }
  test("named multi-expansion rejected") {
    rejects("""{"query":{"aggregations":[{"name":"n","column":"c"}]}}""")
  }

  // ------------------------------------------------------ dataset-aware phase

  private val schema = StructType(Seq(
    StructField("uid", LongType), StructField("ts", LongType),
    StructField("price", DoubleType), StructField("flag", BooleanType),
    StructField("cat", StringType), StructField("arr", ArrayType(LongType))))
  private val spec = DatasetSpec("uid", "ts")

  private def sv(q: GraftQuery): Unit = SchemaValidator.validate(schema, spec, q)
  private def condQ(f: RowFilter): GraftQuery =
    GraftQuery(None, Seq(Condition.Filters(None, Seq(f), Target.Count(CmpOp.Gte, 1), false)),
      None, Nil, None)

  test("schema: unknown column rejected") {
    intercept[QueryValidationException](sv(condQ(RowFilter("nope", FilterOp.Eq, Scalar.Num(1)))))
  }
  test("schema: unsupported-type column rejected") {
    intercept[QueryValidationException](sv(condQ(RowFilter("arr", FilterOp.Eq, Scalar.Num(1)))))
  }
  test("schema: operator/type matrix enforced") {
    sv(condQ(RowFilter("price", FilterOp.Gt, Scalar.Num(1))))           // ok
    sv(condQ(RowFilter("cat", FilterOp.Contains, Scalar.Str("x"))))     // ok
    sv(condQ(RowFilter("flag", FilterOp.Eq, Scalar.Bool(true))))        // ok
    intercept[QueryValidationException](                                // contains on numeric
      sv(condQ(RowFilter("price", FilterOp.Contains, Scalar.Str("x")))))
    intercept[QueryValidationException](                                // > on bool
      sv(condQ(RowFilter("flag", FilterOp.Gt, Scalar.Bool(true)))))
    intercept[QueryValidationException](                                // string value on numeric col
      sv(condQ(RowFilter("price", FilterOp.Eq, Scalar.Str("x")))))
  }
  test("schema: sum target and otherColumn must be numeric") {
    intercept[QueryValidationException](sv(GraftQuery(None,
      Seq(Condition.Filters(None, Seq(RowFilter("cat", FilterOp.Eq, Scalar.Str("x"))),
        Target.Sum("cat", CmpOp.Gte, BigDecimal(1)), false)), None, Nil, None)))
    intercept[QueryValidationException](sv(GraftQuery(None, Nil, None,
      Seq(Aggregation(None, "cat", AggType.SumPerValue, Some("cat"))), None)))
  }

  test("timeframe scale check: digit-count mismatch rejected") {
    val q = GraftQuery(Some(Timeframe(Some(1705L), None)), Nil, None, Nil, None)
    intercept[QueryValidationException](
      SchemaValidator.validateTimeframeScale(q, 1.704e18, 1.706e18))
    val ok = GraftQuery(Some(Timeframe(Some(1705000000000000000L), None)), Nil, None, Nil, None)
    SchemaValidator.validateTimeframeScale(ok, 1.704e18, 1.706e18)
  }

  test("usedColumns collects exactly the referenced columns") {
    val q = QueryParser.parse("""{"query":{
      |"conditions":[{"filter":["cat","==","x"],"target":["sum","price",">",1]}],
      |"aggregations":[{"column":"flag","type":"count"}]},
      |"funnel":{"sequence":[{"filter":["cat","==","y"]}]}}""".stripMargin)
    assert(SchemaValidator.usedColumns(spec, q).toSet ==
      Set("uid", "ts", "cat", "price", "flag"))
  }
}
