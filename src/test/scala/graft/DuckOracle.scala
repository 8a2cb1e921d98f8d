package graft

import scala.sys.process.{Process, ProcessLogger}

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Shared DuckDB side of the differential fuzzers: one batched
  * `tools/fuzz_oracle.py` subprocess over a {name → SQL} map, results as
  * stringified rows ([[QueryFuzzer.canonRows]] canonicalizes both engines'
  * strings before comparing). */
object DuckOracle {

  lazy val available: Boolean =
    Process(Seq("python3", "-c", "import duckdb")).!(ProcessLogger(_ => ())) == 0

  def sparkCell(v: Any): String = v match {
    case null                    => null
    case d: java.math.BigDecimal => d.toPlainString
    case x                       => x.toString
  }

  def run(sqlByName: Map[String, String]): Map[String, Either[String, Seq[Seq[String]]]] = {
    val qFile = java.io.File.createTempFile("oracle_queries", ".json")
    val rFile = java.io.File.createTempFile("oracle_results", ".json")
    val fw = new java.io.FileWriter(qFile)
    try fw.write(org.json4s.jackson.Serialization.write(sqlByName)(DefaultFormats))
    finally fw.close()
    val script = new java.io.File("tools/fuzz_oracle.py").getAbsolutePath
    val rc = Process(Seq("python3", script, qFile.getAbsolutePath, rFile.getAbsolutePath)).!
    require(rc == 0, s"fuzz_oracle.py exited $rc")
    JsonMethods.parse(rFile).asInstanceOf[JObject].obj.map {
      case (k, JArray(rows)) =>
        k -> Right(rows.map {
          case JArray(cells) => cells.map {
            case JNull      => null
            case JString(s) => s
            case other      => JsonMethods.compact(other)
          }
          case other => sys.error(s"bad row in $k: $other")
        })
      case (k, obj: JObject) => k -> Left(JsonMethods.compact(obj))
      case (k, other)        => k -> Left(s"unexpected: $other")
    }.toMap
  }

  /** Compare one case's Spark frame against its oracle rows; Nil = match. */
  def check(name: String, desc: String, sql: String,
            df: org.apache.spark.sql.DataFrame,
            duck: Map[String, Either[String, Seq[Seq[String]]]]): Seq[String] =
    try {
      val got = QueryFuzzer.canonRows(df.collect().toIndexedSeq.map(_.toSeq.map(sparkCell)))
      duck.get(name) match {
        case Some(Right(rows)) =>
          val want = QueryFuzzer.canonRows(rows)
          if (got != want)
            Seq(s"""MISMATCH $name ($desc)
               |sql: $sql
               |spark (${got.size} rows): ${got.take(6).mkString(" | ")}
               |duckdb (${want.size} rows): ${want.take(6).mkString(" | ")}""".stripMargin)
          else Nil
        case Some(Left(err)) => Seq(s"ORACLE ERROR $name ($desc): $err\n$sql")
        case None            => Seq(s"MISSING oracle result for $name")
      }
    } catch {
      case e: Exception =>
        Seq(s"$name ($desc) EXEC FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  /** Evaluate cases concurrently (Spark actions are thread-safe; 4 threads
    * hide per-job scheduling latency at fuzz data sizes). */
  def evalAll(cases: Seq[(String, String, String, () => org.apache.spark.sql.DataFrame)],
              duck: Map[String, Either[String, Seq[Seq[String]]]]): Seq[String] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try Await.result(
      Future.sequence(cases.map { case (n, d, s, f) => Future(check(n, d, s, f(), duck)) }),
      30.minutes).flatten
    finally pool.shutdown()
  }
}
