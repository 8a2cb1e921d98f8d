package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.SparkSession

/**
 * Serving-path latency-floor probe (r15): at 100 TB a query's cost is the
 * scan, but a deployment also answers many SMALL queries, where the
 * per-request overhead — parse, validate, plan (including `bigEnough`'s
 * one optimizer pass for routable shapes), execution of a tiny job, stats
 * settle, cache scope churn, HTTP — sets the latency floor and the max
 * QPS one driver sustains. The reference's serving analog is the Flask
 * apiserver fronting warm Lambdas (frocket/apiserver.py), whose own floor
 * is the invoke round-trip.
 *
 * Run on sf0.001 (1k rows) so execution is negligible and the overhead is
 * what's measured. Modes:
 *   - planning-only: QueryParser.parse + engine.runValidated, NO actions —
 *     isolates the per-request planning cost, routed vs window engines,
 *     and a non-routable filters shape (no bigEnough pass);
 *   - HTTP end-to-end: a live ApiServer answering the routable sequence
 *     query, 1 sequential client and 2 concurrent clients (= the server's
 *     worker pool), requests/sec + per-request percentiles.
 *
 * Prints one JSON line (BENCH.md §"Serving-path latency floor").
 */
object ServingScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.engine.{DatasetSpec, QueryEngine}
    val ev = ops.Tables.events(spark, sfDir)
    val spec = DatasetSpec("user_id", "ts")
    val routedEngine = new QueryEngine(spec).withRoutingThreshold(0)
    val windowEngine = new QueryEngine(spec).withWindowPlan

    val seqJson =
      """{"query": {"conditions": [{"sequence": [
        |  {"filter": ["event_type","==","view"]},
        |  {"filter": ["event_type","==","purchase"]}]}]}}""".stripMargin
    val filtersJson =
      """{"query": {"conditions": [
        |  {"filter": ["event_type","==","purchase"], "target": ["count", ">=", 2]}]}}""".stripMargin

    // -------------------------------------------------- planning-only cost
    // runValidated builds every output frame lazily — no job runs; for the
    // routable shape the routed engine still pays bigEnough's optimizer
    // pass and the window engine doesn't, which is exactly the difference
    // worth a number.
    def planMs(engine: QueryEngine, json: String, iters: Int = 100): Double = {
      val q = graft.query.QueryParser.parse(json)
      (1 to 20).foreach(_ => engine.runValidated(ev, q)) // JIT + analysis warm
      val t0 = System.nanoTime()
      (1 to iters).foreach(_ => engine.runValidated(ev, graft.query.QueryParser.parse(json)))
      (System.nanoTime() - t0) / 1e6 / iters
    }
    val planSeqRouted = planMs(routedEngine, seqJson)
    val planSeqWindow = planMs(windowEngine, seqJson)
    val planFilters = planMs(routedEngine, filtersJson)
    println(f"[serving] planning ms/req: seq routed $planSeqRouted%.2f, " +
      f"seq window $planSeqWindow%.2f, filters $planFilters%.2f")

    // -------------------------------------------------- HTTP end-to-end
    val server = new graft.server.ApiServer(spark, 0, routingMinBytes = Some(0))
    server.start()
    val base = s"http://127.0.0.1:${server.boundPort}"
    val client = HttpClient.newHttpClient()
    def post(path: String, body: String): HttpResponse[String] =
      client.send(HttpRequest.newBuilder(URI.create(base + path))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
    try {
      val reg = post("/datasets/register",
        s"""{"name": "srv", "basepath": "$sfDir/events.parquet",
           | "groupIdColumn": "user_id", "timestampColumn": "ts"}""".stripMargin)
      require(reg.statusCode() == 200, reg.body())

      def oneRequest(): Long = {
        val t = System.nanoTime()
        val r = post("/datasets/srv/query", seqJson)
        require(r.statusCode() == 200 && r.body().contains("\"plan\""), r.body())
        System.nanoTime() - t
      }
      (1 to 30).foreach(_ => oneRequest()) // warm: JIT, parquet footer, plans

      val n1 = 200
      val w0 = System.nanoTime()
      val lat = Array.fill(n1)(oneRequest()).sorted
      val wall1 = (System.nanoTime() - w0) / 1e9
      val rps1 = n1 / wall1
      def pct(p: Double): Double = lat(((lat.length - 1) * p).toInt) / 1e6
      println(f"[serving] 1 client: $rps1%.1f req/s, " +
        f"p50 ${pct(0.5)}%.1f ms, p95 ${pct(0.95)}%.1f ms")

      // 2 concurrent clients = the server's worker-thread count; also the
      // regime the r15 per-query cache scope + stats attribution protect.
      val n2 = 200
      val errs = new java.util.concurrent.atomic.AtomicInteger
      val w2 = System.nanoTime()
      val threads = (1 to 2).map { _ =>
        new Thread(() => (1 to n2 / 2).foreach { _ =>
          try oneRequest() catch { case _: Throwable => errs.incrementAndGet() }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val wall2 = (System.nanoTime() - w2) / 1e9
      val rps2 = n2 / wall2
      require(errs.get() == 0, s"${errs.get()} concurrent requests failed")
      println(f"[serving] 2 clients: $rps2%.1f req/s")

      // Chunked-stream path (r16): the long-query surface clients actually
      // use at 100 TB — progress lines then the result. Its floor is the
      // sync floor plus the server's completion-detection granularity.
      def oneStream(): Long = {
        val t = System.nanoTime()
        val r = post("/datasets/srv/query?stream=true", seqJson)
        require(r.statusCode() == 200, r.body())
        require(r.body().split("\n").last.contains("matchingGroups"), r.body())
        System.nanoTime() - t
      }
      (1 to 20).foreach(_ => oneStream())
      val nS = 100
      val latS = Array.fill(nS)(oneStream()).sorted
      def pctS(p: Double): Double = latS(((latS.length - 1) * p).toInt) / 1e6
      println(f"[serving] stream path: p50 ${pctS(0.5)}%.1f ms, p95 ${pctS(0.95)}%.1f ms")

      // Cached repeats (r15): the same query against a server with the
      // versioned result cache ON — the repeated-dashboard-query regime.
      // The floor collapses to parse + key lookup + HTTP; at 100 TB this
      // is the difference between re-scanning the corpus and answering
      // from the driver's LRU.
      val cServer = new graft.server.ApiServer(spark, 0,
        routingMinBytes = Some(0), resultCacheSize = 64,
        httpThreads = 4) // 4 sync workers so the herd probe below genuinely overlaps
      cServer.start()
      val (rpsC, p50C, soloColdMs, herdWallMs) = try {
        val cBase = s"http://127.0.0.1:${cServer.boundPort}"
        def postC(path: String, body: String): HttpResponse[String] =
          client.send(HttpRequest.newBuilder(URI.create(cBase + path))
            .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
            HttpResponse.BodyHandlers.ofString())
        def reRegister(): Unit = {
          val r = postC("/datasets/register",
            s"""{"name": "srvcache", "basepath": "$sfDir/events.parquet",
               | "groupIdColumn": "user_id", "timestampColumn": "ts"}""".stripMargin)
          require(r.statusCode() == 200, r.body())
        }
        reRegister()
        def oneCached(): Long = {
          val t = System.nanoTime()
          val r = postC("/datasets/srvcache/query", seqJson)
          require(r.statusCode() == 200, r.body())
          System.nanoTime() - t
        }
        oneCached() // cold fill
        (1 to 30).foreach(_ => oneCached()) // warm
        val nC = 500
        val wC = System.nanoTime()
        val latC = Array.fill(nC)(oneCached()).sorted
        val wallC = (System.nanoTime() - wC) / 1e9

        // Cold-key herd (r15): 4 concurrent clients fire the SAME query
        // right after a re-registration invalidated its key — the regime
        // the single-flight latch exists for. Per iteration: re-register
        // (fresh key), measure one solo cold request; re-register again,
        // measure the 4-client batch wall. With coalescing the batch costs
        // ONE execution, so its wall tracks the solo cold request instead
        // of stacking four. Min of 3 iterations (drift protocol: paired,
        // back-to-back).
        val herdErrs = new java.util.concurrent.atomic.AtomicInteger
        val (soloCold, herdWall) = (1 to 3).map { _ =>
          reRegister()
          val solo = oneCached() / 1e6
          reRegister()
          val t0 = System.nanoTime()
          val threads = (1 to 4).map(_ => new Thread(() =>
            try oneCached() catch { case _: Throwable => herdErrs.incrementAndGet() }))
          threads.foreach(_.start()); threads.foreach(_.join())
          (solo, (System.nanoTime() - t0) / 1e6)
        }.minBy(_._2)
        require(herdErrs.get() == 0, s"${herdErrs.get()} herd requests failed")

        (nC / wallC, latC(((latC.length - 1) * 0.5).toInt) / 1e6, soloCold, herdWall)
      } finally cServer.stop()
      println(f"[serving] cached repeats: $rpsC%.1f req/s, p50 $p50C%.2f ms")
      println(f"[serving] cold-key herd of 4: $herdWallMs%.1f ms wall vs solo cold $soloColdMs%.1f ms")

      println(s"""{"metric": "serving_latency", "sf": "$sfDir", """ +
        f""""planning_ms": {"seq_routed": $planSeqRouted%.2f, "seq_window": $planSeqWindow%.2f, "filters": $planFilters%.2f}, """ +
        f""""http": {"rps_1client": $rps1%.1f, "p50_ms": ${pct(0.5)}%.1f, "p95_ms": ${pct(0.95)}%.1f, "rps_2clients": $rps2%.1f, """ +
        f""""stream_p50_ms": ${pctS(0.5)}%.1f, """ +
        f""""rps_cached": $rpsC%.1f, "p50_cached_ms": $p50C%.2f, """ +
        f""""herd4_wall_ms": $herdWallMs%.1f, "solo_cold_ms": $soloColdMs%.1f}}""")
    } finally {
      server.stop()
      spark.stop()
    }
  }
}
