package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.server.ApiServer

/** End-to-end HTTP API coverage: register → list → query → errors, through
  * a real socket (reference apiserver.py parity). */
class ApiServerSpec extends SparkSpec {

  private lazy val server = { val s = new ApiServer(spark, 0); s.start(); s }
  private lazy val base = s"http://127.0.0.1:${server.boundPort}"
  private val client = HttpClient.newHttpClient()

  override def afterAll(): Unit = { server.stop(); super.afterAll() }

  private def post(path: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(base + path))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def get(path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(base + path)).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  test("register, list, query, and error paths over HTTP") {
    val reg = post("/datasets/register",
      """{"name": "ev", "basepath": "/root/testdata/sf0.001/events.parquet",
        | "groupIdColumn": "user_id", "timestampColumn": "ts"}""".stripMargin)
    assert(reg.statusCode() == 200, reg.body())
    assert(reg.body().contains(""""rows": 1000"""))

    val ls = get("/datasets")
    assert(ls.statusCode() == 200 && ls.body().contains(""""name": "ev""""))

    val q = post("/datasets/ev/query",
      """{"query": {"conditions": [
        |  {"filter": ["event_type", "==", "purchase"], "target": ["count", ">=", 2]}]}}""".stripMargin)
    assert(q.statusCode() == 200, q.body())
    assert(q.body().contains(""""matchingGroups": 15"""))
    assert(q.body().contains(""""matchingGroupRows": 1000"""))
    assert(q.body().contains(""""stats""") && q.body().contains(""""rowsScanned"""), q.body())

    // validation error → 400 with errorMessage (reference error shape)
    val bad = post("/datasets/ev/query",
      """{"query": {"conditions": [{"filter": ["nope", "==", "x"]}]}}""")
    assert(bad.statusCode() == 400 && bad.body().contains("errorMessage"), bad.body())

    // timeframe at the wrong scale → 400 (dataset-aware scale check)
    val scale = post("/datasets/ev/query", """{"timeframe": {"from": 1705}}""")
    assert(scale.statusCode() == 400 && scale.body().contains("digits"), scale.body())

    // unknown dataset → 400
    val unk = post("/datasets/nope/query", """{"query": {}}""")
    assert(unk.statusCode() == 400, unk.body())

    // unknown route → 404
    assert(get("/datasets/ev/bogus/deeper").statusCode() == 404)
  }
}
