package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.engine.{DatasetSpec, QueryEngine}

/**
 * Port of the reference's engine correctness corpus
 * (reference: tests/test_query_engine.py) — same fixtures, same expected
 * counts, run through the JSON parser + Spark planner end-to-end.
 */
class QueryEngineSpec extends SparkSpec {

  private val engine = new QueryEngine(DatasetSpec("id", "timestamp"))

  private val Categories = Seq("fishing", "running", "climbing", "snorkeling")
  private val Types      = Seq("view", "click", "purchase", "a2c")
  private val Keywords   = Seq("cat|dog", "mouse|cat|dog", "cat", "dog|mouse|cat")
  private val BeginTs    = 1610555782L
  private val BeginPrice = 100L
  private val AllUsers   = Seq("a", "b", "c", "d")

  private val fixtureSchema = StructType(Seq(
    StructField("id", StringType),
    StructField("timestamp", LongType),
    StructField("category", StringType),
    StructField("type", StringType),
    StructField("price", LongType),
    StructField("keywords", StringType)))

  /** 4 users with 4/8/16/32 rows (reference test_create_data, :196-211). */
  private lazy val fixture: DataFrame = {
    val rows = AllUsers.zipWithIndex.flatMap { case (user, i0) =>
      val idx = i0 + 2
      val n = 1 << idx
      (0 until n).map { i =>
        Map[String, Any](
          "id" -> user,
          "timestamp" -> (BeginTs + idx + i),
          "category" -> Categories(i % 4),
          "type" -> Types(i % 4),
          "price" -> (BeginPrice + idx + i),
          "keywords" -> s"${Keywords(i % 4)}_$user")
      }
    }
    frame(fixtureSchema, rows)
  }

  private def summary(df: DataFrame, json: String): (Long, Long) = {
    val r = engine.runJson(df, json).summary.collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  test("sum target (reference :66-99)") {
    val schema = StructType(Seq(
      StructField("f", LongType), StructField("id", StringType),
      StructField("timestamp", LongType)))
    val rows = (1 to 1000).map(i => Map[String, Any]("f" -> i.toLong, "id" -> "a", "timestamp" -> i.toLong)) :+
      Map[String, Any]("f" -> 10L, "id" -> "b", "timestamp" -> 2L)
    val df = frame(schema, rows)
    val q = """{"query":{"conditions":[{"filter":{"column":"f","op":">","value":0},
              |"target":{"type":"sum","op":"==","column":"f","value":500500}}]}}""".stripMargin
    assert(summary(df, q)._2 == 1000L)
  }

  test("boolean operators with nulls (reference :102-144)") {
    val schema = StructType(Seq(
      StructField("bool_field", BooleanType), StructField("id", StringType),
      StructField("timestamp", LongType)))
    val df = frame(schema, Seq(
      Map("bool_field" -> true, "id" -> "a", "timestamp" -> 1L),
      Map("bool_field" -> false, "id" -> "b", "timestamp" -> 2L),
      Map("id" -> "b", "timestamp" -> 3L)))
    val cases = Seq(
      ("==", "true", 1L, "=="),
      ("!=", "true", 2L, ">"),   // b: one false + one null row both count as != true
      ("==", "false", 2L, "=="),
      ("!=", "false", 3L, "=="))
    for ((op, v, expected, targetOp) <- cases) {
      val q = s"""{"query":{"conditions":[{"filter":{"column":"bool_field","op":"$op","value":$v},
                 |"target":{"type":"count","op":"$targetOp","value":1}}]}}""".stripMargin
      assert(summary(df, q)._2 == expected, s"op=$op value=$v")
    }
  }

  test("numeric operators on count target (reference :149-176)") {
    // timestamp <= BEGIN_TS+5 yields 4/3/2/1 rows for users a/b/c/d
    val cases = Seq(("==", 2, 1L), ("<", 3, 2L), (">", 2, 2L), ("<=", 1, 1L), (">=", 4, 1L), ("!=", 1, 3L))
    for ((op, v, expected) <- cases) {
      val q = s"""{"query":{"relation":"and","conditions":[{
                 |"filter":{"column":"timestamp","op":"<=","value":${BeginTs + 5}},
                 |"target":{"type":"count","op":"$op","value":$v}}]}}""".stripMargin
      assert(summary(fixture, q)._1 == expected, s"count $op $v")
    }
  }

  test("empty query brings all users (reference :214-221)") {
    val (g, r) = summary(fixture, """{"query":{"conditions":[]}}""")
    assert(g == 4L)
    assert(r == (4 + 8 + 16 + 32).toLong)
  }

  test("simple filter (reference :224-246)") {
    val q = """{"query":{"relation":"and","conditions":[{
              |"filter":{"column":"price","op":">","value":133},
              |"target":{"type":"count","op":">","value":2}}]}}""".stripMargin
    val (g, r) = summary(fixture, q)
    assert(g == 1L)     // only user d
    assert(r == 32L)
  }

  test("logical or (reference :249-284)") {
    val q = """{"query":{"relation":"or","conditions":[
              |{"filter":{"column":"price","op":"<=","value":104},"target":{"type":"count","op":">","value":2}},
              |{"filter":{"column":"price","op":">","value":133},"target":{"type":"count","op":">","value":2}}]}}""".stripMargin
    val (g, r) = summary(fixture, q)
    assert(g == 2L)      // users a and d
    assert(r == (4 + 32).toLong)
  }

  test("default aggregations (reference :287-313)") {
    val planned = engine.runJson(fixture,
      """{"query":{"conditions":[],"aggregations":[{"column":"category"}]}}""")
    assert(planned.aggregations.size == 3)
    val byName = planned.aggregations.toMap
    val countDf = byName("category_count")
    assert(countDf.collect()(0).getLong(0) == 60L)
    val cpv = byName("category_countPerValue").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cpv == Categories.map(_ -> 15L).toMap)
    val gpv = byName("category_groupsPerValue").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gpv == Categories.map(_ -> 4L).toMap)
  }

  test("sumPerValue / meanPerValue (reference :316-357)") {
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("timestamp", LongType),
      StructField("category", StringType), StructField("price", LongType)))
    val df = frame(schema, (0 until 10).map(i => Map[String, Any](
      "id" -> "a", "timestamp" -> 1L,
      "category" -> (if (i % 2 == 0) "a" else "b"), "price" -> i.toLong)))
    val sums = engine.runJson(df,
      """{"query":{"aggregations":[{"column":"category","type":"sumPerValue","otherColumn":"price"}]}}""")
      .aggregations.head._2.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sums == Map("a" -> 20.0, "b" -> 25.0)) // sums surface as double (engine contract)
    val means = engine.runJson(df,
      """{"query":{"aggregations":[{"column":"category","type":"meanPerValue","otherColumn":"price"}]}}""")
      .aggregations.head._2.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(means == Map("a" -> 4.0, "b" -> 5.0))
  }

  test("multi-filter conjunction (reference :360-389)") {
    val q = """{"query":{"relation":"or","conditions":[{
              |"filters":[{"column":"price","op":"<=","value":104},
              |           {"column":"category","op":"==","value":"running"}],
              |"target":{"type":"count","op":"==","value":1}}]}}""".stripMargin
    val (g, r) = summary(fixture, q)
    assert(g == 2L)           // users a and b
    assert(r == (4 + 8).toLong)
  }

  test("string operators (reference :392-424)") {
    val cases = Seq(
      ("contains", "dog_a", 0L), ("contains", "dog_b", 8L), ("contains", "dog_c", 16L),
      ("==", "cat_a", 0L), ("==", "cat_c", 16L), ("!=", "cat_a", 56L),
      ("not contains", "mouse", 56L))
    for ((op, v, expected) <- cases) {
      val q = s"""{"query":{"relation":"or","conditions":[{
                 |"filter":{"column":"keywords","op":"$op","value":"$v"},
                 |"target":{"type":"count","op":">","value":3}}]}}""".stripMargin
      assert(summary(fixture, q)._2 == expected, s"keywords $op $v")
    }
  }

  test("sequence conditions (reference :426-497)") {
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("timestamp", LongType),
      StructField("category", LongType), StructField("price", LongType)))
    val rows = (0 until 5).flatMap { i =>
      Seq(
        Map[String, Any]("id" -> "a", "timestamp" -> i.toLong, "category" -> i.toLong, "price" -> 1L),
        Map[String, Any]("id" -> "b", "timestamp" -> i.toLong, "category" -> (if (i < 2) i.toLong else -1L), "price" -> 2L),
        Map[String, Any]("id" -> "c", "timestamp" -> i.toLong, "category" -> (4L - i), "price" -> 3L))
    }
    val df = frame(schema, rows)

    val q1 = """{"query":{"conditions":[{"sequence":[
               |{"filter":["category","==",0]},
               |{"filter":["category","<=",2]},
               |{"filter":["category","<",0]}]}],
               |"aggregations":[{"column":"price"}]}}""".stripMargin
    val p1 = engine.runJson(df, q1)
    assert(p1.summary.collect()(0).getLong(0) == 1L)  // only user b
    val cpv1 = p1.aggregations.toMap.apply("price_countPerValue")
      .collect().map(_.getLong(0)).toSet
    assert(cpv1.contains(2L))

    val q2 = """{"query":{"conditions":[{"sequence":[
               |{"filter":["category",">=",3]},
               |{"filter":["category","<=",2]},
               |{"filter":["category","==",0]}]}],
               |"aggregations":[{"column":"price"}]}}""".stripMargin
    val p2 = engine.runJson(df, q2)
    assert(p2.summary.collect()(0).getLong(0) == 1L)  // only user c
    val cpv2 = p2.aggregations.toMap.apply("price_countPerValue")
      .collect().map(_.getLong(0)).toSet
    assert(cpv2.contains(3L))
  }

  test("sequence requires STRICTLY increasing timestamps (reference query_engine.py:233)") {
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("timestamp", LongType),
      StructField("category", StringType)))
    // user x: both steps at the SAME ts → must NOT pass; user y: increasing ts → passes
    val df = frame(schema, Seq(
      Map("id" -> "x", "timestamp" -> 5L, "category" -> "s0"),
      Map("id" -> "x", "timestamp" -> 5L, "category" -> "s1"),
      Map("id" -> "y", "timestamp" -> 5L, "category" -> "s0"),
      Map("id" -> "y", "timestamp" -> 6L, "category" -> "s1")))
    val q = """{"query":{"conditions":[{"sequence":[
              |{"filter":["category","==","s0"]},
              |{"filter":["category","==","s1"]}]}]}}""".stripMargin
    val (g, _) = summary(df, q)
    assert(g == 1L)
  }

  test("includeZero: count == 0 matches groups with no matching rows (reference C3)") {
    val q = s"""{"query":{"conditions":[{
               |"filter":{"column":"price","op":">","value":133},
               |"target":{"type":"count","op":"==","value":0}}]}}""".stripMargin
    // only user d has price > 133 rows; a, b, c have zero
    val (g, r) = summary(fixture, q)
    assert(g == 3L)
    assert(r == (4 + 8 + 16).toLong)
  }

  test("timeframe bounds rows before conditions (reference S2)") {
    val q = s"""{"timeframe":{"from":${BeginTs + 2},"to":${BeginTs + 6}},
               |"query":{"conditions":[]}}""".stripMargin
    // rows with ts in [BeginTs+2, BeginTs+6): a→4 (ts +2..+5), b→3 (+3..+5), c→2 (+4,+5), d→1 (+5)
    val (g, r) = summary(fixture, q)
    assert(g == 4L)
    assert(r == 10L)
  }

  test("funnel step counts (reference F1)") {
    val q = """{"funnel":{"sequence":[
              |{"filter":["type","==","view"]},
              |{"filter":["type","==","click"]},
              |{"filter":["type","==","purchase"]}]}}""".stripMargin
    val planned = engine.runJson(fixture, q)
    val steps = planned.funnel.get.collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    // every user has view→click→purchase in order (rows cycle v,c,p,a2c with increasing ts)
    assert(steps == Map(0 -> 4L, 1 -> 4L, 2 -> 4L))
  }

  test("capGroupRows: identity when not binding, deterministic bounded sample when binding") {
    import graft.query.QueryAst._
    val q = GraftQuery(None,
      Seq(Condition.Filters(None,
        Seq(RowFilter("type", FilterOp.Eq, Scalar.Str("view"))),
        Target.Count(CmpOp.Gte, 1), includeZero = false)), None, Nil, None)
    // Cap far above the largest group (32 rows): every plan output is
    // bit-identical to the uncapped engine — the knob is semantics-free
    // until it binds.
    val capped = engine.capGroupRows(1000, "timestamp")
    assert(capped.run(fixture, q).summary.collect().toSeq ==
      engine.run(fixture, q).summary.collect().toSeq)
    assert(capped.run(fixture, GraftQuery.empty).matchedRows.collect().toSet ==
      fixture.collect().toSet)
    // Cap of 4 binds on users b/c/d (8/16/32 rows): under-cap groups keep
    // every row exactly, over-cap groups keep a deterministic subset of
    // their own rows.
    val hard = engine.capGroupRows(4, "timestamp")
    def keptCounts() = hard.run(fixture, GraftQuery.empty).matchedRows
      .groupBy(col("id")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val k1 = keptCounts()
    assert(k1("a") == 4L, s"under-cap group resampled: $k1")
    assert(k1.getOrElse("d", 0L) < 32L, s"32-row group not capped: $k1")
    assert(keptCounts() == k1, "cap draw not deterministic")
    val keptRows = hard.run(fixture, GraftQuery.empty).matchedRows.collect().toSet
    assert(keptRows.subsetOf(fixture.collect().toSet), "cap invented rows")
  }
}
