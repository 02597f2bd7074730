package graft

import java.io.IOException
import java.net.{HttpURLConnection, InetSocketAddress, URL}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64
import java.util.concurrent.{ConcurrentHashMap, Executors, ThreadFactory}
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** S9: REST ingest — the Kafka REST Proxy interface the reference exposes
  * as its optional HTTP edge (`/root/reference/docker-compose.yml:104-116`
  * `cp-kafka-rest:7.6.1`, `/root/reference/README.md:38,253` "send/fetch
  * Kafka messages via REST API"), re-expressed for Spark's execution
  * model. The proxy's v2 binary-embedded protocol is public
  * (Content-Type `application/vnd.kafka.binary.v2+json`, base64 payloads;
  * produce = `POST /topics/{t}`, consume = consumer instances with
  * `assignments` + `positions` + `records`).
  *
  * Scale shape (the part that matters at 100 TB): consumption is planned
  * as one BOUNDED OFFSET RANGE per Kafka partition, pinned on the driver
  * from the proxy's metadata endpoints before any data moves, then each
  * range is read by one executor task through its own ephemeral consumer
  * instance. Tasks are deterministic (same range on retry/speculation →
  * same records), the driver never touches record payloads, and a
  * micro-batch loop advances a per-partition offset cursor exactly like
  * [[Sources.snapshotWithCursor]] does for JDBC. Produce is at-least-once
  * (the proxy has no transactional producer): a retried task re-POSTs its
  * slice, so downstream must collapse on a business key — the same
  * merge-key discipline (U2/U3) the reference's ReplacingMergeTree target
  * already imposes on every Kafka consumer.
  */
object RestProxy {

  private val V2 = "application/vnd.kafka.v2+json"
  private val BinaryV2 = "application/vnd.kafka.binary.v2+json"

  /** One consumed record, payloads as raw bytes (base64-decoded). */
  final case class RestRecord(topic: String, partition: Int, offset: Long,
                              key: Array[Byte], value: Array[Byte])

  /** Minimal v2 REST Proxy client. Serializable (carries only the URL);
    * every method opens short-lived `HttpURLConnection`s, so one instance
    * can be shared by a task without pooled state. Consumer instances are
    * addressed via the proxy's returned `base_uri` when its host
    * resolves (required for sticky routing behind a multi-node proxy),
    * falling back to `{baseUrl}/consumers/{group}/instances/{id}` when
    * it doesn't — the reference compose advertises an internal hostname
    * (`KAFKA_REST_HOST_NAME: rest-proxy`) that executors outside that
    * network cannot resolve. Transient transport faults (5xx, timeouts,
    * torn bodies) retry bounded; instance expiry recovers in
    * [[RangeIterator]].
    */
  final case class Client(baseUrl: String,
                          connectTimeoutMs: Int = 10000,
                          readTimeoutMs: Int = 30000) extends Serializable {
    @transient private lazy val mapper = new ObjectMapper()

    /** Partition ids of `topic` (`GET /topics/{t}/partitions`). */
    def partitions(topic: String): Seq[Int] =
      httpJson("GET", s"$baseUrl/topics/$topic/partitions", None, V2)
        .elements().asScala.map(_.get("partition").asInt()).toSeq.sorted

    /** (beginning, end) offsets of one partition — end is exclusive, the
      * offset the NEXT produced record gets
      * (`GET /topics/{t}/partitions/{p}/offsets`).
      */
    def offsets(topic: String, partition: Int): (Long, Long) = {
      val n = httpJson(
        "GET", s"$baseUrl/topics/$topic/partitions/$partition/offsets",
        None, V2)
      (n.get("beginning_offset").asLong(), n.get("end_offset").asLong())
    }

    /** Produce binary records (`POST /topics/{t}`, base64-embedded).
      * `partition = null` delegates placement to the broker side
      * (key-hash for keyed records). Returns the number produced.
      * At-least-once: a replay of the same iterator appends duplicates.
      */
    def produce(topic: String,
                records: Iterator[(Array[Byte], Array[Byte], Integer)],
                batchSize: Int = 500): Long = {
      var n = 0L
      records.grouped(batchSize).foreach { batch =>
        val root = mapper.createObjectNode()
        val arr = root.putArray("records")
        batch.foreach { case (k, v, p) =>
          val rec = arr.addObject()
          if (k == null) rec.putNull("key")
          else rec.put("key", Base64.getEncoder.encodeToString(k))
          if (v == null) rec.putNull("value")
          else rec.put("value", Base64.getEncoder.encodeToString(v))
          if (p == null) rec.putNull("partition")
          else rec.put("partition", p.intValue())
        }
        val resp = httpJson(
          "POST", s"$baseUrl/topics/$topic",
          Some(mapper.writeValueAsString(root)), BinaryV2)
        // the proxy reports per-record failures INSIDE a 200 response —
        // ignoring them silently drops records (e.g. a partition out of
        // range); surface the first one
        resp.get("offsets").elements().asScala
          .find(o => o.get("error_code") != null &&
                     !o.get("error_code").isNull)
          .foreach { o =>
            throw new IOException(
              s"produce to $topic rejected a record: error_code=" +
              s"${o.get("error_code")} ${o.get("error")}")
          }
        n += batch.size
      }
      n
    }

    /** Read exactly `[from, until)` of one partition through an ephemeral
      * consumer instance (create → assign → seek → poll* → delete).
      * Deterministic for a fixed range — the property that makes a Spark
      * task retry/speculative re-run safe. Strict convenience over
      * [[consumeRangeIterator]] with guaranteed instance cleanup; for
      * ranges that should stream through a task without materializing
      * (an uncapped backlog drain) use the iterator form.
      */
    def consumeRange(topic: String, partition: Int, from: Long, until: Long,
                     group: String = "graft-range"): Seq[RestRecord] = {
      val it = consumeRangeIterator(topic, partition, from, until, group)
      try it.toSeq finally it.close()
    }

    /** Lazily-paginated `[from, until)` read: one proxy poll per demand,
      * O(one poll) records resident at a time — the shape a Spark
      * `PartitionReader` or `flatMap` pulls through a task without ever
      * holding the whole range (the 100 TB backlog case). The consumer
      * instance is created on first pull and deleted at exhaustion or
      * [[RangeIterator.close]]; if a task dies between the two, the
      * instance leaks until the proxy's idle timeout reaps it
      * (`consumer.instance.timeout.ms`, a real proxy's standard
      * behavior) — callers that can, should close() in a finally.
      */
    def consumeRangeIterator(topic: String, partition: Int, from: Long,
                             until: Long, group: String = "graft-range")
        : RangeIterator =
      new RangeIterator(this, topic, partition, from, until, group)

    /** Create a consumer instance and return its REST URI. Prefers the
      * proxy's advertised `base_uri` when its host actually resolves —
      * behind a multi-node proxy or load balancer the advertised URI is
      * the only one guaranteed to route follow-up assignment/poll/delete
      * calls to the node that HOSTS the instance (a sticky-routing
      * requirement of the real proxy). The reference compose advertises
      * an internal hostname (`KAFKA_REST_HOST_NAME: rest-proxy`) that
      * external executors cannot resolve, so when resolution fails we
      * fall back to `baseUrl` — correct for a single-node endpoint,
      * which that deployment is.
      */
    private[graft] def createInstance(group: String): String = {
      val node = httpJson(
        "POST", s"$baseUrl/consumers/$group",
        Some("""{"format":"binary","auto.offset.reset":"earliest"}"""), V2)
      val id = node.get("instance_id").asText()
      val fallback = s"$baseUrl/consumers/$group/instances/$id"
      Option(node.get("base_uri")).filterNot(_.isNull).map(_.asText())
        .filter(u => u.nonEmpty && hostResolves(u))
        .getOrElse(fallback)
    }

    private def hostResolves(uri: String): Boolean =
      try {
        java.net.InetAddress.getByName(new URL(uri).getHost); true
      } catch { case _: Exception => false }

    private[graft] def assignSeek(iuri: String, topic: String,
                                  partition: Int, from: Long): Unit =
      retryingTransient(s"assign+seek $iuri") {
        http("POST", s"$iuri/assignments",
             Some(s"""{"partitions":[{"topic":"$topic","partition":$partition}]}"""),
             V2)
        http("POST", s"$iuri/positions",
             Some(s"""{"offsets":[{"topic":"$topic","partition":$partition,"offset":$from}]}"""),
             V2)
      }

    /** One records GET, deliberately NOT transport-retried: a fetch
      * that fails mid-flight (torn body, dropped connection, 5xx after
      * the broker read) may ALREADY have advanced the server-side
      * consumer position past records the client never received — a
      * blind re-GET would silently skip them (at-most-once). The
      * [[RangeIterator]] owns poll retries and re-seeks its next
      * unread offset first.
      */
    private[graft] def pollOnce(iuri: String): Seq[RestRecord] =
      jsonOrThrow("GET",
                  s"$iuri/records?timeout=1000&max_bytes=1048576",
                  None, BinaryV2)
        .elements().asScala.map { r =>
          RestRecord(
            r.get("topic").asText(), r.get("partition").asInt(),
            r.get("offset").asLong(), b64Field(r, "key"),
            b64Field(r, "value"))
        }.toSeq

    private[graft] def deleteInstance(iuri: String): Unit =
      try http("DELETE", iuri, None, V2)
      catch { case _: IOException => () } // cleanup is best-effort

    private def b64Field(node: JsonNode, field: String): Array[Byte] = {
      val f = node.get(field)
      if (f == null || f.isNull) null else Base64.getDecoder.decode(f.asText())
    }

    /** Request + JSON parse under one retry scope, so a torn/truncated
      * 200 body (parse failure) retries the same as a 5xx or a timeout.
      * A body that truncates to NOTHING is the nastiest tear: Jackson
      * parses "" to a MissingNode, which every iterator-shaped caller
      * would silently read as an empty result (an empty partition list,
      * an empty poll) — so it is rejected here as the transport fault
      * it is, not returned.
      */
    private[graft] def httpJson(method: String, url: String,
                                body: Option[String],
                                contentType: String): JsonNode =
      retryingTransient(s"$method $url") {
        jsonOrThrow(method, url, body, contentType)
      }

    private def jsonOrThrow(method: String, url: String,
                            body: Option[String],
                            contentType: String): JsonNode = {
      val node = mapper.readTree(http(method, url, body, contentType))
      if (node == null || node.isMissingNode)
        throw new IOException(s"$method $url returned an empty/torn body")
      node
    }

    /** Bounded retry for TRANSIENT transport faults only: HTTP 5xx,
      * connect/read timeouts, torn bodies (premature EOF / unparseable
      * 200 response). 4xx responses are semantic errors and surface
      * immediately — instance expiry (40403) is recovered one level up
      * ([[RangeIterator]] recreates + reseeks), everything else is the
      * caller's bug. Produce POSTs retry too: the proxy has no
      * transactional producer, so a replayed batch is the documented
      * at-least-once duplicate the downstream merge keys absorb.
      */
    private def retryingTransient[T](what: String)(f: => T): T = {
      val attempts = 4
      var i = 0
      while (true) {
        i += 1
        try return f
        catch {
          case e: HttpStatusException if e.code < 500 => throw e
          case e @ (_: IOException |
                    _: com.fasterxml.jackson.core.JacksonException)
              if i < attempts =>
            // linear backoff, bounded: transient proxy hiccups
            // (restart, LB blip) clear in well under a second
            Thread.sleep(100L * i)
            val _ = e
        }
      }
      throw new IllegalStateException("unreachable")
    }

    private def http(method: String, url: String, body: Option[String],
                     contentType: String): String = {
      val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setRequestMethod(method)
      conn.setRequestProperty("Accept", contentType)
      body.foreach { b =>
        conn.setRequestProperty("Content-Type", contentType)
        conn.setDoOutput(true)
        conn.getOutputStream.write(b.getBytes(UTF_8))
      }
      try {
        val code = conn.getResponseCode
        if (code >= 400) {
          val err = Option(conn.getErrorStream)
            .map(s => new String(s.readAllBytes(), UTF_8)).getOrElse("")
          throw new HttpStatusException(code,
            s"$method $url -> HTTP $code: $err")
        }
        new String(conn.getInputStream.readAllBytes(), UTF_8)
      } finally conn.disconnect()
    }
  }

  /** An HTTP error response, status-code-typed so retry/recovery logic
    * can distinguish transient 5xx from semantic 4xx.
    */
  final class HttpStatusException(val code: Int, msg: String)
      extends IOException(msg)

  /** One bounded partition range as a lazy pull iterator — see
    * [[Client.consumeRangeIterator]]. Not thread-safe (one task, one
    * iterator, like any `PartitionReader`).
    */
  final class RangeIterator(client: Client, topic: String, partition: Int,
                            from: Long, until: Long, group: String)
      extends Iterator[RestRecord] with AutoCloseable {
    private var iuri: String = _
    private var buf: Iterator[RestRecord] = Iterator.empty
    private var nextOff = from
    private var closed = false

    override def hasNext: Boolean = {
      if (closed) return false
      while (!buf.hasNext && nextOff < until) poll()
      if (buf.hasNext) true
      else { close(); false }
    }

    override def next(): RestRecord = {
      if (!hasNext) throw new NoSuchElementException("range exhausted")
      buf.next()
    }

    override def close(): Unit = {
      if (!closed) {
        closed = true
        if (iuri != null) client.deleteInstance(iuri)
      }
    }

    // instance expiry (proxy restart / idle-timeout reap — HTTP 404 on
    // the instance URI, the real proxy's standard failure mode) is
    // recovered in place: recreate + reseek at nextOff, bounded times
    private var recreations = 0
    private val MaxRecreations = 3
    // transient poll fetch failures (torn body, dropped connection,
    // 5xx) are retried HERE, not at the transport layer: the failed
    // fetch may already have advanced the server-side consumer position
    // past records the client never received, so every retry RE-SEEKS
    // the next unread offset first — at-least-once, never at-most-once
    private val MaxPollRetries = 4
    // a real cp-kafka-rest routinely returns an EMPTY records array on
    // the first GET after create/assign/seek (the underlying consumer
    // hasn't completed its initial fetch within the poll timeout), so an
    // empty poll is retried a bounded number of times — only after the
    // retries are exhausted AND the offsets endpoint confirms the range
    // should still exist is it declared truncated
    private val MaxEmptyPolls = 8

    private def ensureInstance(): Unit =
      if (iuri == null) {
        iuri = client.createInstance(group)
        client.assignSeek(iuri, topic, partition, nextOff)
      }

    private def pollRecovering(): Seq[RestRecord] = {
      var attempts = 0
      while (true) {
        try {
          ensureInstance()
          return client.pollOnce(iuri)
        } catch {
          case e: HttpStatusException
              if e.code == 404 && recreations < MaxRecreations =>
            recreations += 1
            iuri = null // recreate + reseek at nextOff via ensureInstance
          case e: HttpStatusException if e.code < 500 => throw e
          case e @ (_: IOException |
                    _: com.fasterxml.jackson.core.JacksonException)
              if attempts < MaxPollRetries =>
            attempts += 1
            Thread.sleep(100L * attempts)
            // reseek before the re-poll: the torn fetch may have moved
            // the server-side position past undelivered records
            if (iuri != null)
              try client.assignSeek(iuri, topic, partition, nextOff)
              catch { case _: Exception => iuri = null }
        }
      }
      throw new IllegalStateException("unreachable")
    }

    private def poll(): Unit =
      try {
        var recs = pollRecovering()
        var empties = 0
        while (recs.isEmpty && empties < MaxEmptyPolls) {
          empties += 1
          Thread.sleep(math.min(100L * empties, 500L))
          recs = pollRecovering()
        }
        if (recs.isEmpty) {
          val (_, end) = client.offsets(topic, partition)
          throw new IllegalStateException(
            s"consume of $topic/$partition truncated at offset $nextOff " +
            s"of [$from,$until) after $MaxEmptyPolls empty polls " +
            s"(broker end offset now $end) — retention expired mid-read?")
        }
        recs.foreach(r => nextOff = math.max(nextOff, r.offset + 1))
        buf = recs.iterator.filter(_.offset < until)
      } catch {
        // free the instance before surfacing the failure — the caller
        // sees the exception either way, the broker shouldn't see a leak
        case e: Throwable => close(); throw e
      }
  }

  /** Kafka's DefaultPartitioner key hash (murmur2, public algorithm from
    * the Apache Kafka client) — what `cp-kafka-rest` applies to keyed
    * records produced without an explicit partition.
    */
  private[graft] def murmur2(data: Array[Byte]): Int = {
    val seed = 0x9747b28c
    val m = 0x5bd1e995
    val r = 24
    val length = data.length
    var h = seed ^ length
    val length4 = length / 4
    var i = 0
    while (i < length4) {
      val i4 = i * 4
      var k = (data(i4) & 0xff) | ((data(i4 + 1) & 0xff) << 8) |
        ((data(i4 + 2) & 0xff) << 16) | ((data(i4 + 3) & 0xff) << 24)
      k *= m
      k ^= k >>> r
      k *= m
      h *= m
      h ^= k
      i += 1
    }
    (length % 4) match {
      case 3 =>
        h ^= (data((length & ~3) + 2) & 0xff) << 16
        h ^= (data((length & ~3) + 1) & 0xff) << 8
        h ^= data(length & ~3) & 0xff
        h *= m
      case 2 =>
        h ^= (data((length & ~3) + 1) & 0xff) << 8
        h ^= data(length & ~3) & 0xff
        h *= m
      case 1 =>
        h ^= data(length & ~3) & 0xff
        h *= m
      case _ => ()
    }
    h ^= h >>> 13
    h *= m
    h ^= h >>> 15
    h
  }

  private[graft] def keyPartition(key: Array[Byte], n: Int): Int =
    (murmur2(key) & 0x7fffffff) % n

  /** In-memory, in-JVM stand-in for `rest-proxy` + broker — the same role
    * `MemoryStream` plays for the Kafka source in the executed streaming
    * keys, but over REAL localhost HTTP so the client, the base64 framing,
    * the consumer-instance lifecycle, and the executor-side fetch path are
    * all exercised for real (only the broker behind the proxy is
    * simulated). Thread-safe: Spark's 32 local executor threads produce
    * and consume against it concurrently in the specs and in
    * `q_rest_ingest`. Semantics mirrored from the real stack: topics
    * auto-create on first produce with `numPartitions` partitions (the
    * reference compose leaves broker auto-create on); unkeyed,
    * partitionless records round-robin; keyed ones take murmur2(key) mod
    * n; polls return at most `maxPollRecords` so multi-poll pagination is
    * exercised; unknown topics/instances get proxy-style error bodies.
    */
  final class InMemoryServer(numPartitions: Int = 4,
                             maxPollRecords: Int = 500) {
    require(numPartitions > 0, "numPartitions must be positive")

    private val mapper = new ObjectMapper()
    // topic -> per-partition log; appends synchronize on the partition's
    // buffer, reads snapshot under the same monitor
    private val topics =
      new ConcurrentHashMap[String, Array[ArrayBuffer[(Array[Byte], Array[Byte])]]]()
    private final class Consumer {
      @volatile var assigned: Seq[(String, Int)] = Seq.empty
      val positions = new ConcurrentHashMap[(String, Int), java.lang.Long]()
    }
    private val consumers = new ConcurrentHashMap[String, Consumer]()
    private val instanceSeq = new AtomicInteger(0)
    private val roundRobin = new AtomicInteger(0)
    private var server: HttpServer = _

    /** Bind an ephemeral localhost port; returns the base URL. */
    def start(): String = synchronized {
      require(server == null, "already started")
      server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
      server.createContext("/", (ex: HttpExchange) => handle(ex))
      server.setExecutor(Executors.newFixedThreadPool(16, new ThreadFactory {
        def newThread(r: Runnable): Thread = {
          val t = new Thread(r, "graft-rest-proxy-stub")
          t.setDaemon(true)
          t
        }
      }))
      server.start()
      s"http://127.0.0.1:${server.getAddress.getPort}"
    }

    def stop(): Unit = synchronized {
      if (server != null) { server.stop(0); server = null }
    }

    /** Live consumer-instance count — lets tests assert that readers
      * free their instances (a real proxy reaps leaks by idle timeout;
      * the stand-in makes the leak observable instead).
      */
    def activeConsumers: Int = consumers.size()

    private def log(topic: String) =
      topics.computeIfAbsent(topic,
        _ => Array.fill(numPartitions)(ArrayBuffer.empty))

    private def handle(ex: HttpExchange): Unit = {
      try {
        val parts = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty)
        val method = ex.getRequestMethod
        (method, parts.toList) match {
          case ("POST", "topics" :: t :: Nil) => produce(ex, t)
          case ("GET", "topics" :: t :: "partitions" :: Nil) =>
            ifTopic(ex, t) { logs =>
              respond(ex, 200, logs.indices
                .map(p => s"""{"partition":$p}""").mkString("[", ",", "]"))
            }
          case ("GET", "topics" :: t :: "partitions" :: p :: "offsets" :: Nil) =>
            ifTopic(ex, t) { logs =>
              val pi = p.toInt
              if (pi < 0 || pi >= logs.length) error(ex, 404, 40402,
                s"partition $pi not found")
              else {
                val end = logs(pi).synchronized(logs(pi).size.toLong)
                respond(ex, 200,
                  s"""{"beginning_offset":0,"end_offset":$end}""")
              }
            }
          case ("POST", "consumers" :: g :: Nil) =>
            val id = s"inst-${instanceSeq.incrementAndGet()}"
            consumers.put(s"$g/$id", new Consumer)
            respond(ex, 200, s"""{"instance_id":"$id","base_uri":""" +
              s""""http://127.0.0.1:${server.getAddress.getPort}/consumers/$g/instances/$id"}""")
          case ("POST", "consumers" :: g :: "instances" :: i :: "assignments" :: Nil) =>
            ifConsumer(ex, g, i) { c =>
              val body = mapper.readTree(ex.getRequestBody.readAllBytes())
              c.assigned = body.get("partitions").elements().asScala
                .map(n => (n.get("topic").asText(), n.get("partition").asInt()))
                .toSeq
              respond(ex, 204, "")
            }
          case ("POST", "consumers" :: g :: "instances" :: i :: "positions" :: Nil) =>
            ifConsumer(ex, g, i) { c =>
              val body = mapper.readTree(ex.getRequestBody.readAllBytes())
              body.get("offsets").elements().asScala.foreach { n =>
                c.positions.put(
                  (n.get("topic").asText(), n.get("partition").asInt()),
                  n.get("offset").asLong())
              }
              respond(ex, 204, "")
            }
          case ("GET", "consumers" :: g :: "instances" :: i :: "records" :: Nil) =>
            ifConsumer(ex, g, i) { c => poll(ex, c) }
          case ("DELETE", "consumers" :: g :: "instances" :: i :: Nil) =>
            if (consumers.remove(s"$g/$i") == null)
              error(ex, 404, 40403, s"consumer instance $i not found")
            else respond(ex, 204, "")
          case _ => error(ex, 404, 404, s"no route: $method ${parts.mkString("/")}")
        }
      } catch {
        case e: Exception => error(ex, 500, 500, String.valueOf(e.getMessage))
      } finally ex.close()
    }

    private def produce(ex: HttpExchange, topic: String): Unit = {
      val logs = log(topic)
      val body = mapper.readTree(ex.getRequestBody.readAllBytes())
      val offsets = body.get("records").elements().asScala.map { r =>
        val key = optB64(r, "key")
        val value = optB64(r, "value")
        val p = r.get("partition") match {
          case pn if pn != null && !pn.isNull => pn.asInt()
          case _ if key != null => keyPartition(key, numPartitions)
          case _ =>
            (roundRobin.getAndIncrement() & 0x7fffffff) % numPartitions
        }
        if (p < 0 || p >= numPartitions)
          s"""{"partition":$p,"offset":-1,"error_code":40402,""" +
            """"error":"partition out of range"}"""
        else {
          val off = logs(p).synchronized {
            logs(p) += ((key, value)); logs(p).size - 1L
          }
          s"""{"partition":$p,"offset":$off,"error_code":null,"error":null}"""
        }
      }.mkString(",")
      respond(ex, 200,
        s"""{"key_schema_id":null,"value_schema_id":null,"offsets":[$offsets]}""")
    }

    private def poll(ex: HttpExchange, c: Consumer): Unit = {
      val out = ArrayBuffer.empty[String]
      c.assigned.foreach { case (t, p) =>
        val logs = topics.get(t)
        if (logs != null && p >= 0 && p < logs.length && out.size < maxPollRecords) {
          val from = Option(c.positions.get((t, p))).map(_.longValue()).getOrElse(0L)
          val slice = logs(p).synchronized {
            logs(p).slice(from.toInt,
              math.min(logs(p).size, from.toInt + (maxPollRecords - out.size)))
              .toIndexedSeq
          }
          slice.zipWithIndex.foreach { case ((k, v), i) =>
            out += s"""{"topic":"$t","partition":$p,"offset":${from + i},""" +
              s""""key":${jsonB64(k)},"value":${jsonB64(v)}}"""
          }
          if (slice.nonEmpty) c.positions.put((t, p), from + slice.size)
        }
      }
      respond(ex, 200, out.mkString("[", ",", "]"))
    }

    private def jsonB64(b: Array[Byte]): String =
      if (b == null) "null"
      else "\"" + Base64.getEncoder.encodeToString(b) + "\""

    private def optB64(node: JsonNode, field: String): Array[Byte] = {
      val f = node.get(field)
      if (f == null || f.isNull) null else Base64.getDecoder.decode(f.asText())
    }

    private def ifTopic(ex: HttpExchange, t: String)(
        f: Array[ArrayBuffer[(Array[Byte], Array[Byte])]] => Unit): Unit = {
      val logs = topics.get(t)
      if (logs == null) error(ex, 404, 40401, s"topic $t not found")
      else f(logs)
    }

    private def ifConsumer(ex: HttpExchange, g: String, i: String)(
        f: Consumer => Unit): Unit = {
      val c = consumers.get(s"$g/$i")
      if (c == null) error(ex, 404, 40403, s"consumer instance $i not found")
      else f(c)
    }

    private def error(ex: HttpExchange, http: Int, code: Int,
                      msg: String): Unit =
      respond(ex, http,
        s"""{"error_code":$code,"message":${mapper.writeValueAsString(msg)}}""")

    private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes(UTF_8)
      ex.getResponseHeaders.add("Content-Type", V2)
      ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    }
  }
}
