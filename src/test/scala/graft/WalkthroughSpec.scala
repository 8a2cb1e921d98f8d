package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.engine.{DatasetSpec, QueryEngine}

/**
 * Acceptance fixture mirroring the reference's Retailrocket walkthrough
 * (docs/example-dataset.md:290-550): the same query shapes, run through the
 * JSON parser, against a 5-user dataset small enough that every expected
 * count is hand-derived. Each test also pins the walkthrough's published
 * consistency invariants (count>1 + count==1 = all buyers; count==0 is the
 * complement; the sum-target minus single-purchase delta; funnel step
 * monotonicity).
 *
 * Fixture (visitorid, timestamp, event, price):
 *   u1: view@1, addtocart@2, transaction@3 (60), view@4      — classic path
 *   u2: view@10, transaction@20 (30), transaction@30 (30)    — 2 small buys
 *   u3: view@1, view@2                                       — never buys
 *   u4: addtocart@5, transaction@10 (10), view@20            — out of order
 *   u5: view@1, addtocart@2, transaction@3 (100),
 *       transaction@4 (20)                                   — big spender
 */
class WalkthroughSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("visitorid", LongType), StructField("timestamp", LongType),
    StructField("event", StringType), StructField("price", DoubleType)))

  private lazy val events: DataFrame = frame(schema, Seq(
    (1L, 1L, "view", null), (1L, 2L, "addtocart", null),
    (1L, 3L, "transaction", 60.0), (1L, 4L, "view", null),
    (2L, 10L, "view", null), (2L, 20L, "transaction", 30.0),
    (2L, 30L, "transaction", 30.0),
    (3L, 1L, "view", null), (3L, 2L, "view", null),
    (4L, 5L, "addtocart", null), (4L, 10L, "transaction", 10.0),
    (4L, 20L, "view", null),
    (5L, 1L, "view", null), (5L, 2L, "addtocart", null),
    (5L, 3L, "transaction", 100.0), (5L, 4L, "transaction", 20.0)
  ).map { case (u, t, e, p) =>
    Map[String, Any]("visitorid" -> u, "timestamp" -> t, "event" -> e) ++
      Option(p).map("price" -> _)
  })

  private val engine = new QueryEngine(DatasetSpec("visitorid", "timestamp"))

  private def summary(json: String): (Long, Long) = {
    val r = engine.runJson(events, json).summary.collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  test("implicit target: groups with any transaction, rows are ALL their rows") {
    // example-dataset.md:293-318 — matchingGroupRows counts every row of a
    // matching group, not just the rows matching the filter.
    val (g, r) = summary(
      """{"query": {"conditions": [{"filter": ["event", "==", "transaction"]}]}}""")
    assert(g == 4) // u1 u2 u4 u5
    assert(r == 14) // 4 + 3 + 3 + 4
  }

  test("count>1 / count==1 partition the buyers; count==0 is the complement") {
    // example-dataset.md:321-344: 2528 + 9041 = 11569; 0-buyers = the rest.
    val (multi, _) = summary(
      """{"query": {"conditions": [{"filter": ["event", "==", "transaction"], "target": ["count", ">", 1]}]}}""")
    val (single, _) = summary(
      """{"query": {"conditions": [{"filter": ["event", "==", "transaction"], "target": ["count", "==", 1]}]}}""")
    val (zero, _) = summary(
      """{"query": {"conditions": [{"filter": ["event", "==", "transaction"], "target": ["count", "==", 0]}]}}""")
    assert(multi == 2)  // u2 u5
    assert(single == 2) // u1 u4
    assert(multi + single == 4)
    assert(zero == 1)   // u3
    assert(multi + single + zero == 5) // every user accounted for
  }

  test("verbose and shorthand notations plan identically") {
    // example-dataset.md:346-368
    val shorthand = summary(
      """{"query": {"conditions": [{"filter": ["event", "==", "transaction"], "target": ["count", ">", 1]}]}}""")
    val verbose = summary(
      """{"query": {"conditions": [{
        |  "filter": {"column": "event", "op": "==", "value": "transaction"},
        |  "target": {"type": "count", "op": ">", "value": 1}}]}}""".stripMargin)
    assert(shorthand == verbose)
  }

  test("multi-filter condition: all filters must match in the SAME row") {
    // example-dataset.md:372-391 — 6097 users with a single purchase >= 50
    val (g, _) = summary(
      """{"query": {"conditions": [{"filters": [
        |  {"column": "event", "op": "==", "value": "transaction"},
        |  {"column": "price", "op": ">=", "value": 50}]}]}}""".stripMargin)
    assert(g == 2) // u1 (60), u5 (100); u2's SUM is 60 but no single row >= 50
  }

  test("sum target is a superset of the single-purchase filter") {
    // example-dataset.md:395-410 — 6505 vs 6097
    val (g, _) = summary(
      """{"query": {"conditions": [{
        |  "filter": {"column": "event", "op": "==", "value": "transaction"},
        |  "target": {"type": "sum", "column": "price", "op": ">=", "value": 50}}]}}""".stripMargin)
    assert(g == 3) // u1 (60), u2 (30+30), u5 (120)
  }

  test("two conditions AND'd: big total but no big single purchase (the 408 delta)") {
    // example-dataset.md:422-448 — 6505 - 6097 = 408
    val (g, _) = summary(
      """{"query": {"relation": "and", "conditions": [
        |  {"filters": [
        |     {"column": "event", "op": "==", "value": "transaction"},
        |     {"column": "price", "op": ">=", "value": 50}],
        |   "target": ["count", "==", 0]},
        |  {"filter": ["event", "==", "transaction"],
        |   "target": ["sum", "price", ">=", 50]}]}}""".stripMargin)
    assert(g == 1) // u2 only: sum 60 >= 50, no single purchase >= 50
  }

  test("sequence condition: steps must occur in strictly increasing time") {
    // example-dataset.md:461-487 — sequence matches fewer than all buyers
    val (g, _) = summary(
      """{"query": {"conditions": [{"sequence": [
        |  {"filter": ["event", "==", "view"]},
        |  {"filter": ["event", "==", "addtocart"]},
        |  {"filter": ["event", "==", "transaction"]}]}]}}""".stripMargin)
    assert(g == 2) // u1, u5; u4 bought but its addtocart PRECEDES its view
  }

  test("funnel: per-step group/row counts with no conditions") {
    // example-dataset.md:505-550 — overall summary = everyone; step counts
    // drop monotonically; per-step rows are all rows of surviving groups.
    val json =
      """{"funnel": {"sequence": [
        |  {"filter": ["event", "==", "view"]},
        |  {"filter": ["event", "==", "addtocart"]},
        |  {"filter": ["event", "==", "transaction"]}]}}""".stripMargin
    val plan = engine.runJson(events, json)
    val (g, r) = { val s = plan.summary.collect()(0); (s.getLong(0), s.getLong(1)) }
    assert(g == 5 && r == 16) // no conditions: everyone matches
    val steps = plan.funnel.get.collect()
      .map(x => x.getInt(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(steps(0) == ((5L, 16L))) // all users have a view
    assert(steps(1) == ((2L, 8L)))  // u1, u5: view before addtocart
    assert(steps(2) == ((2L, 8L)))  // ... then transaction
    assert(steps(0)._1 >= steps(1)._1 && steps(1)._1 >= steps(2)._1)
  }
}
