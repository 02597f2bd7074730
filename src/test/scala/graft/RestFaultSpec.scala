package graft

import java.io.IOException
import java.net.{HttpURLConnection, InetSocketAddress, URL}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicBoolean

import scala.collection.mutable

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._

/** HTTP-layer fault injection for the S9 REST edge — the network analog
  * of [[FaultFs]]: a real localhost HTTP proxy sits between the client
  * and the broker stand-in, forwards verbatim, and injects exactly one
  * fault at a chosen call site. Swept faults: HTTP 500, torn/truncated
  * response body, connection drop (headers promised, nothing sent),
  * consumer-instance 404 (instance expiry — the real proxy's standard
  * failure mode after a restart, reference `docker-compose.yml:104-116`),
  * and a stalled response against a short client read timeout. The
  * assertion everywhere: the batch loop + persisted cursor + bounded
  * client retry + task retry converge to the no-fault state bit-for-bit.
  */
class RestFaultSpec extends SparkSpec {
  import spark.implicits._

  private sealed trait Kind
  private case object Http500 extends Kind
  private case object TornBody extends Kind
  private case object Drop extends Kind
  private case object Instance404 extends Kind
  private final case class Stall(ms: Long) extends Kind

  /** One-shot fault-injecting HTTP forward proxy. `arm(site, kind)`
    * fires on the NEXT request whose classified call site matches,
    * then passes everything through.
    */
  private final class FaultHttpProxy(target: String) {
    @volatile private var armedSite: String = _
    @volatile private var armedKind: Kind = _
    private val fired = new AtomicBoolean(false)
    val sitesSeen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    private var server: HttpServer = _
    @volatile private var selfUrl: String = _

    def start(): String = {
      server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
      server.createContext("/", (ex: HttpExchange) => handle(ex))
      server.setExecutor(java.util.concurrent.Executors
        .newFixedThreadPool(8))
      server.start()
      selfUrl = s"http://127.0.0.1:${server.getAddress.getPort}"
      selfUrl
    }

    def stop(): Unit = if (server != null) server.stop(0)

    def arm(site: String, kind: Kind): Unit = {
      fired.set(false)
      armedKind = kind
      armedSite = site
    }

    /** Classify a request into the client call site that issued it. */
    def classify(method: String, path: String): String = {
      val p = path.split("/").filter(_.nonEmpty).toList
      (method, p) match {
        case ("POST", "topics" :: _ :: Nil)                  => "produce"
        case ("GET", "topics" :: _ :: "partitions" :: Nil)   => "partitions"
        case ("GET", "topics" :: _ :: "partitions" :: _ :: "offsets" :: Nil) =>
          "offsets"
        case ("POST", "consumers" :: _ :: Nil)               => "create"
        case ("POST", _ :+ "assignments")                    => "assign"
        case ("POST", _ :+ "positions")                      => "seek"
        case ("GET", _ :+ "records")                         => "poll"
        case ("DELETE", "consumers" :: _)                    => "delete"
        case _                                               => "other"
      }
    }

    private def handle(ex: HttpExchange): Unit = {
      try {
        val site = classify(ex.getRequestMethod, ex.getRequestURI.getPath)
        sitesSeen.add(site)
        val inject = site == armedSite && fired.compareAndSet(false, true)
        val kind = armedKind
        if (inject) kind match {
          case Http500 =>
            respond(ex, 500,
              """{"error_code":50001,"message":"injected broker error"}""")
            return
          case Instance404 =>
            respond(ex, 404,
              """{"error_code":40403,"message":"injected instance expiry"}""")
            return
          case Drop =>
            // promise a body, send none: the client sees premature EOF
            ex.sendResponseHeaders(200, 64)
            ex.close()
            return
          case Stall(ms) => Thread.sleep(ms) // then forward normally
          case TornBody  => ()               // handled after the forward
        }
        val (code, rawBody, ct) = forward(ex)
        // keep the proxy in the path: the stand-in advertises ITS OWN
        // address as base_uri; rewrite it so instance-scoped follow-ups
        // route through here (exactly what an LB-fronted real proxy
        // advertises to clients)
        val body =
          if (site == "create")
            new String(rawBody, UTF_8).replace(target, selfUrl)
              .getBytes(UTF_8)
          else rawBody
        if (inject && kind == TornBody && body.length >= 2) {
          ex.getResponseHeaders.add("Content-Type", ct)
          ex.sendResponseHeaders(code, body.length)
          ex.getResponseBody.write(body, 0, body.length / 2)
          ex.close()
        } else {
          ex.getResponseHeaders.add("Content-Type", ct)
          ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
          if (body.nonEmpty) ex.getResponseBody.write(body)
          ex.close()
        }
      } catch { case _: Exception => ex.close() }
    }

    private def forward(ex: HttpExchange): (Int, Array[Byte], String) = {
      val uri = ex.getRequestURI
      val q = Option(uri.getRawQuery).map("?" + _).getOrElse("")
      val conn = new URL(target + uri.getRawPath + q).openConnection()
        .asInstanceOf[HttpURLConnection]
      conn.setRequestMethod(ex.getRequestMethod)
      Seq("Content-Type", "Accept").foreach { h =>
        val v = ex.getRequestHeaders.getFirst(h)
        if (v != null) conn.setRequestProperty(h, v)
      }
      val reqBody = ex.getRequestBody.readAllBytes()
      if (reqBody.nonEmpty) {
        conn.setDoOutput(true)
        conn.getOutputStream.write(reqBody)
      }
      val code = conn.getResponseCode
      val body =
        try {
          val s = if (code >= 400) conn.getErrorStream else conn.getInputStream
          if (s == null) Array.empty[Byte] else s.readAllBytes()
        } catch { case _: IOException => Array.empty[Byte] }
      val ct = Option(conn.getHeaderField("Content-Type"))
        .getOrElse("application/vnd.kafka.v2+json")
      conn.disconnect()
      (code, body, ct)
    }

    private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes(UTF_8)
      ex.getResponseHeaders.add("Content-Type",
                                "application/vnd.kafka.v2+json")
      ex.sendResponseHeaders(code, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    }
  }

  private def withFaultProxy[A](numPartitions: Int = 2)(
      f: (RestProxy.InMemoryServer, FaultHttpProxy, String) => A): A = {
    val srv = new RestProxy.InMemoryServer(numPartitions, maxPollRecords = 8)
    val direct = srv.start()
    val proxy = new FaultHttpProxy(direct)
    val url = proxy.start()
    try f(srv, proxy, url)
    finally { proxy.stop(); srv.stop() }
  }

  /** The consume-side call sites every ingest path exercises. */
  private val ConsumeSites =
    Seq("partitions", "offsets", "create", "assign", "seek", "poll",
        "delete")

  test("restIngestDrain converges bit-for-bit under every fault kind at " +
       "every client call site") {
    withFaultProxy() { (_, proxy, url) =>
      // backlog produced through the DIRECT url — the sweep targets the
      // consume side; produce faults get their own test below
      Sources.restProduce(
        (0 until 36).map(i => (s"k$i", s"v$i")).toDF("k", "v"), url, "bk",
        col("k"), col("v"), pmod(xxhash64(col("k")), lit(2)))

      def drainConverged(cdir: String): (Set[(Int, Long, String)],
                                         Map[Int, Long]) = {
        val rows = mutable.Set.empty[(Int, Long, String)]
        var attempts = 0
        var done = false
        while (!done && attempts < 6) {
          attempts += 1
          try {
            Sources.restIngestDrain(spark, url, "bk", cdir,
                                    maxPerPartition = 10L) { df =>
              rows ++= df.select("partition", "offset", "value").collect()
                .map(r => (r.getInt(0), r.getLong(1),
                           new String(r.getAs[Array[Byte]](2), UTF_8)))
            }
            done = true
          } catch { case _: Throwable => () }
        }
        assert(done, s"drain did not converge within 6 restarts")
        (rows.toSet, Sources.readRestCursor(spark, cdir))
      }

      def freshDir() = java.nio.file.Files
        .createTempDirectory("graft-fault-cur").toString + "/cur"

      val (baseRows, baseCursor) = drainConverged(freshDir())
      assert(baseRows.size == 36 && baseCursor.values.sum == 36L)
      val seen = proxy.sitesSeen.toArray.map(_.toString).toSet
      assert(ConsumeSites.toSet.subsetOf(seen),
             s"baseline must exercise every consume site, saw $seen")

      val kinds = Seq(Http500, TornBody, Drop, Instance404)
      for (site <- ConsumeSites; kind <- kinds) {
        proxy.arm(site, kind)
        val (rows, cursor) = drainConverged(freshDir())
        assert(rows == baseRows,
               s"$kind@$site: rows diverged from the no-fault state")
        assert(cursor == baseCursor,
               s"$kind@$site: cursor diverged from the no-fault state")
      }
    }
  }

  test("graft-rest streaming source converges bit-for-bit under every " +
       "fault kind at every call site, across restarts on one checkpoint") {
    withFaultProxy() { (_, proxy, url) =>
      Sources.restProduce(
        (0 until 30).map(i => (s"k$i", s"v$i")).toDF("k", "v"), url, "st",
        col("k"), col("v"), pmod(xxhash64(col("k")), lit(2)))

      def streamConverged(): Set[(Int, Long, String)] = {
        val ckpt = java.nio.file.Files
          .createTempDirectory("graft-fault-ckpt").toString
        val out = java.nio.file.Files
          .createTempDirectory("graft-fault-out").toString + "/sink"
        var attempts = 0
        var done = false
        while (!done && attempts < 6) {
          attempts += 1
          try {
            val q = spark.readStream.format("graft-rest")
              .option("url", url).option("topic", "st")
              .option("maxRecordsPerPartition", "6")
              .load()
              .writeStream.format("parquet")
              .option("checkpointLocation", ckpt)
              .option("path", out)
              .start()
            try q.processAllAvailable() finally q.stop()
            done = true
          } catch { case _: Throwable => () }
        }
        assert(done, "stream did not converge within 6 restarts")
        spark.read.parquet(out)
          .select("partition", "offset", "value").collect()
          .map(r => (r.getInt(0), r.getLong(1),
                     new String(r.getAs[Array[Byte]](2), UTF_8)))
          .toSet
      }

      val base = streamConverged()
      assert(base.size == 30, "file-sink commit log must dedup restarts")
      val kinds = Seq(Http500, TornBody, Drop, Instance404)
      // create/assign/seek/poll/delete run executor-side inside the
      // partition reader; partitions/offsets run at admission planning
      for (site <- ConsumeSites; kind <- kinds) {
        proxy.arm(site, kind)
        val got = streamConverged()
        assert(got == base,
               s"$kind@$site: sink diverged from the no-fault state")
      }
    }
  }

  test("produce through a faulty proxy stays at-least-once: no record " +
       "lost, duplicates only from a torn success response") {
    withFaultProxy() { (_, proxy, url) =>
      // 500 on the produce POST: the forward never happened, the retry
      // is the only append — exactly-once in practice
      proxy.arm("produce", Http500)
      Sources.restProduce(
        (0 until 10).map(i => (s"a$i", s"x$i")).toDF("k", "v"), url, "p1",
        col("k"), col("v"), lit(0))
      val c = RestProxy.Client(url)
      val got1 = c.consumeRange("p1", 0, 0, c.offsets("p1", 0)._2)
        .map(r => new String(r.value, UTF_8))
      assert(got1.sorted == (0 until 10).map(i => s"x$i").sorted)

      // torn body on a SUCCESSFUL produce: the append landed, the retry
      // appends again — the documented at-least-once duplicate
      proxy.arm("produce", TornBody)
      Sources.restProduce(
        (0 until 10).map(i => (s"b$i", s"y$i")).toDF("k", "v"), url, "p2",
        col("k"), col("v"), lit(0))
      val got2 = c.consumeRange("p2", 0, 0, c.offsets("p2", 0)._2)
        .map(r => new String(r.value, UTF_8))
      assert(got2.toSet == (0 until 10).map(i => s"y$i").toSet,
             "every record must survive")
      assert(got2.size >= 10,
             "a torn success may replay the batch, never drop it")
    }
  }

  test("a stalled response against a short read timeout retries " +
       "transiently and completes") {
    withFaultProxy() { (_, proxy, url) =>
      val c = RestProxy.Client(url, readTimeoutMs = 300)
      c.produce("sl", (0 until 5).iterator
        .map(i => (s"k$i".getBytes(UTF_8), s"v$i".getBytes(UTF_8),
                   java.lang.Integer.valueOf(0))))
      proxy.arm("poll", Stall(1200))
      val got = c.consumeRange("sl", 0, 0, 5)
        .map(r => new String(r.value, UTF_8))
      assert(got == (0 until 5).map(i => s"v$i"))
    }
  }
}
