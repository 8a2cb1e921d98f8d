package graft.server

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

import graft.catalog.Catalog
import graft.engine.{DatasetSpec, QueryEngine}
import graft.query.{QueryParser, QueryValidationException, SchemaValidator}
import graft.result.{JobStats, ResultJson}

/**
 * HTTP API front — parity with the reference's Flask apiserver
 * (frocket/apiserver.py), on the JDK's built-in HttpServer (zero deps):
 *
 *   POST /datasets/register        {"name","basepath","groupIdColumn","timestampColumn"}
 *   GET  /datasets                 list registered datasets
 *   POST /datasets/<name>/query    JSON query body → reference-shaped result
 *
 * Errors return the reference's shape: {"errorMessage": ...} with 400 for
 * validation failures and 500 otherwise (apiserver.py error handling).
 * The Spark driver hosts the server; queries run as ordinary Spark jobs.
 */
final class ApiServer(spark: SparkSession, port: Int) {

  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  def boundPort: Int = server.getAddress.getPort

  def start(): Unit = {
    server.createContext("/datasets", (ex: HttpExchange) => handle(ex))
    server.setExecutor(null) // single-threaded: Spark driver serializes queries anyway
    server.start()
  }

  def stop(): Unit = server.stop(0)

  private def handle(ex: HttpExchange): Unit =
    try {
      val path = ex.getRequestURI.getPath.stripSuffix("/")
      val method = ex.getRequestMethod
      (method, path.split("/").toList.filter(_.nonEmpty)) match {
        case ("POST", List("datasets", "register")) => register(ex)
        case ("GET",  List("datasets"))             => list(ex)
        case ("POST", List("datasets", name, "query")) => query(ex, name)
        case _ => respond(ex, 404, """{"errorMessage": "not found"}""")
      }
    } catch {
      case e: QueryValidationException =>
        respond(ex, 400, s"""{"errorMessage": ${q(e.getMessage)}}""")
      case e: Catalog.RegistrationException =>
        respond(ex, 400, s"""{"errorMessage": ${q(e.getMessage)}}""")
      case e: com.fasterxml.jackson.core.JacksonException =>
        respond(ex, 400, s"""{"errorMessage": ${q("malformed JSON: " + e.getOriginalMessage)}}""")
      case e: Throwable =>
        respond(ex, 500, s"""{"errorMessage": ${q(String.valueOf(e.getMessage))}}""")
    } finally ex.close()

  private def register(ex: HttpExchange): Unit = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val body = JsonMethods.parse(readBody(ex))
    def str(k: String): String = body \ k match {
      case JString(s) => s
      case _ => throw QueryValidationException("schema", s"register requires string field '$k'")
    }
    val ds = Catalog.register(spark, str("name"), str("basepath"),
      str("groupIdColumn"), str("timestampColumn"))
    respond(ex, 200,
      s"""{"dataset": ${q(ds.name)}, "rows": ${ds.numRows}, "groups": ${ds.numGroups},
         | "minTimestamp": ${ds.minTimestamp}, "maxTimestamp": ${ds.maxTimestamp},
         | "unsupportedColumns": [${ds.unsupportedColumns.map(q).mkString(", ")}]}""".stripMargin)
  }

  private def list(ex: HttpExchange): Unit = {
    val items = Catalog.list().sortBy(_.name).map { ds =>
      s"""{"name": ${q(ds.name)}, "basepath": ${q(ds.basepath)}, "rows": ${ds.numRows}}"""
    }
    respond(ex, 200, s"""{"datasets": [${items.mkString(", ")}]}""")
  }

  private def query(ex: HttpExchange, name: String): Unit = {
    val ds = Catalog.get(name).getOrElse(
      throw QueryValidationException("schema", s"Unknown dataset '$name'"))
    val parsed = QueryParser.parse(readBody(ex))
    SchemaValidator.validateTimeframeScale(parsed, ds.minTimestamp, ds.maxTimestamp)
    val df = Catalog.load(spark, name)
    val engine = new QueryEngine(DatasetSpec(ds.groupIdColumn, ds.timestampColumn))
    val (body, stats) = try JobStats.measure(spark) {
      ResultJson.build(engine.runValidated(df, parsed))
    } finally graft.util.Caches.drain() // no cache build-up in a long-lived server
    respond(ex, 200, body.dropRight(1) + s""", "stats": ${stats.toJson}}""")
  }

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
  }

  private def q(s: String): String =
    "\"" + Option(s).getOrElse("null").flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}

/** `runMain graft.server.ApiServerMain [port]` — serve until killed. */
object ApiServerMain {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(8318)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val srv = new ApiServer(spark, port)
    srv.start()
    println(s"""{"serving": ${srv.boundPort}}""")
    Thread.currentThread().join()
  }
}
