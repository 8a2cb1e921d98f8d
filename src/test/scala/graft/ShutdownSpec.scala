package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.funsuite.AnyFunSuite

/**
 * End-to-end SIGTERM drain (r17): forks a REAL `ApiServerMain` JVM —
 * shutdown hooks can't be exercised in-process without killing the test
 * JVM — registers a dataset, fires async queries, then sends SIGTERM
 * (`Process.destroy`) and asserts the process (a) runs the graceful-drain
 * hook, (b) reports every admitted job drained, and (c) actually exits.
 * This is the ops contract the README documents for GRAFT_DRAIN_SEC /
 * `terminationGracePeriodSeconds`: a kill is a drain, not an abrupt stop.
 *
 * Standalone AnyFunSuite, not SparkSpec: the child owns its own
 * SparkSession; this JVM's session is never touched. Child output goes to
 * a temp FILE, not a pipe: `Process.destroy()` closes the parent-side
 * pipe streams along with sending the signal (java.lang.Process scaladoc),
 * so everything the child prints AFTER the signal — including the very
 * drain line under test — is lost to a pipe reader. A file receives it
 * regardless of the parent's stream state.
 */
class ShutdownSpec extends AnyFunSuite {

  private val client = HttpClient.newHttpClient()

  test("SIGTERM to ApiServerMain drains in-flight async queries before exit") {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    // Inherit this (sbt-forked) JVM's own flags — the JDK-17 --add-opens
    // set and the spark -D defaults from build.sbt — minus the heap sizing
    // (the child needs far less than the suite's 8g).
    import scala.jdk.CollectionConverters._
    val inherited = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
      .filterNot(a => a.startsWith("-Xmx") || a.startsWith("-Xms") || a.startsWith("@"))
    // Classpath via @argsfile: a single exec arg is capped at 128 KiB on
    // Linux and the test classpath (every /opt/spark/jars entry) can
    // approach it. No quoting needed — no paths with spaces.
    val cpFile = java.nio.file.Files.createTempFile("graft_shutdown_cp", ".txt")
    java.nio.file.Files.writeString(cpFile,
      s"-cp\n${System.getProperty("java.class.path")}\n")
    val cmd = (Seq(javaBin) ++ inherited ++ Seq("-Xmx2g", s"@$cpFile",
      "graft.server.ApiServerMain", "0")).asJava
    val outFile = java.nio.file.Files.createTempFile("graft_shutdown_out", ".log")
    val pb = new ProcessBuilder(cmd)
    pb.redirectErrorStream(true)
    pb.redirectOutput(outFile.toFile)
    val proc = pb.start()
    def log(): String = new String(java.nio.file.Files.readAllBytes(outFile))
    try {
      // Wait for the serving line (cold Spark startup).
      val bootDeadline = System.currentTimeMillis() + 120000
      def servedPort(): Option[Int] =
        """\{"serving": (\d+)\}""".r.findFirstMatchIn(log()).map(_.group(1).toInt)
      while (servedPort().isEmpty && proc.isAlive &&
             System.currentTimeMillis() < bootDeadline) Thread.sleep(200)
      val port = servedPort().getOrElse(fail(s"server never came up:\n${log()}"))

      val base = s"http://127.0.0.1:$port"
      def post(path: String, body: String): HttpResponse[String] =
        client.send(HttpRequest.newBuilder(URI.create(base + path))
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofString())
      val reg = post("/datasets/register",
        """{"name": "sigdrain", "basepath": "/root/testdata/sf0.001/events.parquet",
          | "groupIdColumn": "user_id", "timestampColumn": "ts"}""".stripMargin)
      assert(reg.statusCode() == 200, reg.body())
      // Two in-flight async jobs the drain must complete, 202'd BEFORE the
      // signal lands.
      (1 to 2).foreach { _ =>
        val sub = post("/datasets/sigdrain/query?async=true", """{"query": {}}""")
        assert(sub.statusCode() == 202, sub.body())
      }

      proc.destroy() // SIGTERM — NOT destroyForcibly (that's SIGKILL)
      assert(proc.waitFor(90, java.util.concurrent.TimeUnit.SECONDS),
        "process did not exit within 90s of SIGTERM")
      val finalLog = log()
      assert(finalLog.contains(""""shutdown": "graceful""""),
        s"exit=${proc.exitValue()} no graceful-drain line:\n$finalLog")
      assert(finalLog.contains(""""drained": true"""),
        s"drain dropped in-flight async jobs:\n$finalLog")
      // Hook-ORDERING pin (Hadoop priority 60 > Spark's 40): the admitted
      // queries must have FINISHED on a live SparkContext — a drain that
      // raced Spark's teardown completes the runnables but fails the
      // queries inside them, which the shutdown line reports.
      assert(finalLog.contains(""""jobsFailed": 0"""),
        s"drained queries failed mid-drain (Spark torn down underneath?):\n$finalLog")
    } finally proc.destroyForcibly()
  }
}
