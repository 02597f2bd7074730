package graft

import java.io.IOException
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

/** S9 REST ingest: the v2 protocol client, the in-memory proxy stand-in,
  * and the Spark-level produce/consume path — all over real localhost
  * HTTP (SURVEY.md §2.1 S9). The contract under test is the one the
  * reference's `cp-kafka-rest` edge exposes: binary embedded format
  * (base64), explicit/keyed/round-robin placement, consumer-instance
  * assign+seek+poll, and offset bookkeeping.
  */
class RestProxySpec extends SparkSpec {
  import spark.implicits._

  private def withServer[A](numPartitions: Int = 4, maxPoll: Int = 500)(
      f: (RestProxy.InMemoryServer, RestProxy.Client) => A): A = {
    val srv = new RestProxy.InMemoryServer(numPartitions, maxPoll)
    val url = srv.start()
    try f(srv, RestProxy.Client(url))
    finally srv.stop()
  }

  private def rec(k: String, v: String, p: Integer = null) =
    (if (k == null) null else k.getBytes(UTF_8), v.getBytes(UTF_8), p)

  test("produce to explicit partitions, consumeRange reads exactly the range") {
    withServer() { (_, c) =>
      c.produce("t", Iterator(
        rec("a", "v0", 1), rec("b", "v1", 1), rec("c", "v2", 1),
        rec("d", "w0", 2)))
      assert(c.partitions("t") == Seq(0, 1, 2, 3))
      assert(c.offsets("t", 1) == (0L, 3L))
      assert(c.offsets("t", 0) == (0L, 0L))
      val got = c.consumeRange("t", 1, 1, 3)
      assert(got.map(r => (r.partition, r.offset,
                           new String(r.value, UTF_8))) ==
        Seq((1, 1L, "v1"), (1, 2L, "v2")))
      assert(new String(got.head.key, UTF_8) == "b")
    }
  }

  test("keyed records without partition follow murmur2 key hash; unkeyed round-robin evenly") {
    withServer(numPartitions = 4) { (_, c) =>
      val keys = (0 until 40).map(i => s"k$i")
      c.produce("keyed", keys.iterator.map(k => rec(k, s"v-$k")))
      keys.foreach { k =>
        val expected = RestProxy.keyPartition(k.getBytes(UTF_8), 4)
        val (_, end) = c.offsets("keyed", expected)
        val hit = c.consumeRange("keyed", expected, 0, end)
          .exists(r => new String(r.key, UTF_8) == k)
        assert(hit, s"key $k must land on murmur2 partition $expected")
      }
      c.produce("rr", Iterator.tabulate(40)(i => rec(null, s"u$i")))
      val perPart = (0 until 4).map(p => c.offsets("rr", p)._2)
      assert(perPart == Seq(10L, 10L, 10L, 10L))
    }
  }

  test("null key and null value round-trip as nulls") {
    withServer() { (_, c) =>
      c.produce("n", Iterator((null, "only-value".getBytes(UTF_8),
                               java.lang.Integer.valueOf(0)),
                              ("only-key".getBytes(UTF_8), null,
                               java.lang.Integer.valueOf(0))))
      val got = c.consumeRange("n", 0, 0, 2)
      assert(got(0).key == null &&
             new String(got(0).value, UTF_8) == "only-value")
      assert(new String(got(1).key, UTF_8) == "only-key" &&
             got(1).value == null)
    }
  }

  test("consumeRange paginates across polls and preserves offset order") {
    withServer(numPartitions = 1, maxPoll = 100) { (_, c) =>
      c.produce("big", Iterator.tabulate(1200)(i => rec(null, s"m$i", 0)))
      val got = c.consumeRange("big", 0, 0, 1200)
      assert(got.size == 1200)
      assert(got.map(_.offset) == (0L until 1200L))
      assert(new String(got(777).value, UTF_8) == "m777")
    }
  }

  test("unknown topic and out-of-range partition surface proxy-style errors") {
    withServer() { (_, c) =>
      val e1 = intercept[IOException](c.partitions("nope"))
      assert(e1.getMessage.contains("404") &&
             e1.getMessage.contains("40401"))
      c.produce("t2", Iterator(rec("a", "v", 0)))
      val e2 = intercept[IOException](c.offsets("t2", 99))
      assert(e2.getMessage.contains("40402"))
      // a per-record failure rides INSIDE a 200 produce response — the
      // client must surface it, not silently drop the record
      val e3 = intercept[IOException](
        c.produce("t2", Iterator(rec("a", "lost?", 99))))
      assert(e3.getMessage.contains("error_code"))
    }
  }

  test("consumeRange beyond the log fails loudly instead of hanging or truncating silently") {
    withServer() { (_, c) =>
      c.produce("short", Iterator(rec("a", "v", 0)))
      val e = intercept[IllegalStateException](
        c.consumeRange("short", 0, 0, 5))
      assert(e.getMessage.contains("truncated"))
    }
  }

  test("restConsumeWithCursor: distributed read, cursor continuity, no loss or duplication") {
    withServer(numPartitions = 3) { (srv, c) =>
      val url = c.baseUrl
      val wave1 = (0 until 90).map(i => (s"k$i", s"w1-$i"))
      Sources.restProduce(
        wave1.toDF("k", "v"), url, "ev", col("k"), col("v"),
        pmod(xxhash64(col("k")), lit(3)))
      val (df1, cur1) = Sources.restConsumeWithCursor(spark, url, "ev")
      val got1 = df1.select(col("value").cast("string")).as[String].collect()
      assert(got1.sorted.toSeq == wave1.map(_._2).sorted)
      assert(cur1.values.sum == 90L)

      val wave2 = (90 until 120).map(i => (s"k$i", s"w2-$i"))
      Sources.restProduce(
        wave2.toDF("k", "v"), url, "ev", col("k"), col("v"),
        pmod(xxhash64(col("k")), lit(3)))
      val (df2, cur2) = Sources.restConsumeWithCursor(spark, url, "ev", cur1)
      val got2 = df2.select(col("value").cast("string")).as[String].collect()
      assert(got2.sorted.toSeq == wave2.map(_._2).sorted)
      assert(cur2.values.sum == 120L)
      // a third batch from the latest cursor is empty, not an error
      val (df3, _) = Sources.restConsumeWithCursor(spark, url, "ev", cur2)
      assert(df3.count() == 0)
    }
  }

  test("ranges are pinned at plan time: records produced after the call never leak in") {
    withServer(numPartitions = 2) { (_, c) =>
      val url = c.baseUrl
      Sources.restProduce(
        Seq(("a", "old0"), ("b", "old1")).toDF("k", "v"), url, "pin",
        col("k"), col("v"), pmod(xxhash64(col("k")), lit(2)))
      val (df, cursor) = Sources.restConsumeWithCursor(spark, url, "pin")
      // produced AFTER planning, BEFORE the action below
      Sources.restProduce(
        Seq(("c", "new0")).toDF("k", "v"), url, "pin",
        col("k"), col("v"), pmod(xxhash64(col("k")), lit(2)))
      val got = df.select(col("value").cast("string")).as[String].collect()
      assert(got.sorted.toSeq == Seq("old0", "old1"))
      val (dfNext, _) = Sources.restConsumeWithCursor(spark, url, "pin", cursor)
      assert(dfNext.select(col("value").cast("string"))
        .as[String].collect().toSeq == Seq("new0"))
    }
  }

  test("maxPerPartition bounds a batch; the cursor drains the backlog over multiple batches") {
    withServer(numPartitions = 2) { (_, c) =>
      val url = c.baseUrl
      Sources.restProduce(
        (0 until 50).map(i => (s"k$i", s"v$i")).toDF("k", "v"), url, "bk",
        col("k"), col("v"), pmod(xxhash64(col("k")), lit(2)))
      var cursor = Map.empty[Int, Long]
      var total = 0L
      var batches = 0
      var drained = false
      while (!drained) {
        val (df, next) = Sources.restConsumeWithCursor(
          spark, url, "bk", cursor, maxPerPartition = Some(10L))
        val n = df.count()
        assert(n <= 20, "a batch must respect the per-partition cap")
        total += n
        batches += 1
        drained = n == 0
        cursor = next
      }
      assert(total == 50L)
      assert(batches >= 3, "the cap must force multiple batches")
    }
  }

  test("property: arbitrary binary keys/values round-trip bit-exact " +
       "through base64 framing, and broker-side keyed placement matches " +
       "the client-side murmur2 computation") {
    import org.scalacheck.{Arbitrary, Gen, Prop, Test => SCTest}
    // empty arrays, high bytes, invalid-UTF-8 sequences — the payloads a
    // string-typed test never exercises
    val bytesGen: Gen[Array[Byte]] =
      Gen.listOf(Arbitrary.arbitrary[Byte]).map(_.toArray)
    val recordsGen: Gen[List[(Array[Byte], Array[Byte])]] =
      Gen.nonEmptyListOf(Gen.zip(
        Gen.oneOf(bytesGen, Gen.const(null: Array[Byte])), bytesGen))
    withServer(numPartitions = 4) { (_, c) =>
      val topicSeq = new java.util.concurrent.atomic.AtomicInteger(0)
      val res = SCTest.check(
        SCTest.Parameters.default.withMinSuccessfulTests(60),
        Prop.forAll(recordsGen) { recs =>
          val t = s"prop${topicSeq.incrementAndGet()}"
          c.produce(t, recs.iterator.map { case (k, v) => (k, v, null) })
          val got = (0 until 4).flatMap { p =>
            val (_, end) = c.offsets(t, p)
            c.consumeRange(t, p, 0, end)
          }
          val placementOk = got.forall(r =>
            r.key == null ||
              r.partition == RestProxy.keyPartition(r.key, 4))
          def ms(xs: Seq[(Seq[Byte], Seq[Byte])]) =
            xs.groupBy(identity).view.mapValues(_.size).toMap
          val sent = ms(recs.map { case (k, v) =>
            (if (k == null) null else k.toSeq, v.toSeq) })
          val received = ms(got.map(r =>
            (if (r.key == null) null else r.key.toSeq, r.value.toSeq)))
          placementOk && sent == received
        })
      assert(res.passed, res.status.toString)
    }
  }

  test("concurrent producers: offsets stay dense and unique, no record " +
       "lost under 16-way contention on one partition") {
    withServer(numPartitions = 2) { (_, c) =>
      val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
      val futures = (0 until 16).map { t =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          // batchSize=1 → 50 separate POSTs per thread, maximal interleave
          def call(): Long = c.produce("hot",
            Iterator.tabulate(50)(i => rec(null, s"t$t-m$i", 0)),
            batchSize = 1)
        })
      }
      futures.foreach(_.get())
      pool.shutdown()
      assert(c.offsets("hot", 0) == (0L, 800L))
      val got = c.consumeRange("hot", 0, 0, 800)
      assert(got.map(_.offset) == (0L until 800L))
      val values = got.map(r => new String(r.value, UTF_8)).toSet
      assert(values.size == 800)
      assert((0 until 16).forall(t =>
        (0 until 50).forall(i => values.contains(s"t$t-m$i"))))
    }
  }

  test("consumeRangeIterator: lazy pagination, mid-range close frees the " +
       "consumer instance, exhaustion frees it too") {
    withServer(numPartitions = 1, maxPoll = 10) { (srv, c) =>
      c.produce("lz", Iterator.tabulate(100)(i => rec(null, s"m$i", 0)))
      // mid-range close: pull 25 of [0, 100) (crosses poll pages), stop
      val it = c.consumeRangeIterator("lz", 0, 0, 100)
      val head = it.take(25).toSeq
      assert(head.map(_.offset) == (0L until 25L))
      assert(srv.activeConsumers == 1, "instance live while mid-range")
      it.close()
      assert(srv.activeConsumers == 0, "close() must free the instance")
      // exhaustion: draining the iterator frees the instance by itself
      val it2 = c.consumeRangeIterator("lz", 0, 90, 100)
      assert(it2.map(_.offset).toSeq == (90L until 100L))
      assert(srv.activeConsumers == 0, "exhaustion must free the instance")
      // strict form still cleans up
      assert(c.consumeRange("lz", 0, 0, 100).size == 100)
      assert(srv.activeConsumers == 0)
    }
  }

  test("persisted cursor: versioned publish, torn-newest fallback, " +
       "at-least-once replay after a failed batch, bounded drain") {
    withServer(numPartitions = 2) { (_, c) =>
      val url = c.baseUrl
      val dir = java.nio.file.Files
        .createTempDirectory("graft-rest-cursor").toString + "/cur"

      // 1. versioned publish + read-back
      Sources.writeRestCursor(spark, dir, Map(0 -> 3L, 1 -> 5L))
      assert(Sources.readRestCursor(spark, dir) == Map(0 -> 3L, 1 -> 5L))
      Sources.writeRestCursor(spark, dir, Map(0 -> 7L, 1 -> 5L))
      assert(Sources.readRestCursor(spark, dir) == Map(0 -> 7L, 1 -> 5L))

      // 2. a torn newest version (zero bytes — the crash shape between
      // create and content reaching disk) falls back to the previous
      // committed cursor instead of failing or resetting to zero
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "cursor-99"), Array.empty[Byte])
      assert(Sources.readRestCursor(spark, dir) == Map(0 -> 7L, 1 -> 5L))

      // 3. ingest loop: a batch whose process THROWS commits nothing;
      // the retry redelivers the same records
      val cdir = java.nio.file.Files
        .createTempDirectory("graft-rest-cursor2").toString + "/cur"
      Sources.restProduce(
        (0 until 30).map(i => (s"k$i", s"v$i")).toDF("k", "v"), url, "lp",
        col("k"), col("v"), pmod(xxhash64(col("k")), lit(2)))
      val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
      intercept[RuntimeException] {
        Sources.restIngestBatch(spark, url, "lp", cdir) { df =>
          seen += df.count()
          throw new RuntimeException("downstream died mid-batch")
        }
      }
      assert(Sources.readRestCursor(spark, cdir).isEmpty,
             "a failed batch must not advance the cursor")
      val cur = Sources.restIngestBatch(spark, url, "lp", cdir) { df =>
        seen += df.count()
      }
      assert(seen.toSeq == Seq(30L, 30L), "retry must redeliver the batch")
      assert(cur.values.sum == 30L)

      // 4. an idle batch moves nothing and writes no cursor version
      val before = new java.io.File(cdir).list().toSeq
      assert(Sources.restIngestBatch(spark, url, "lp", cdir)(
               _ => fail("process must not run on an empty batch")) == cur)
      assert(new java.io.File(cdir).list().toSeq == before)

      // 5. drain: a deep backlog crosses in bounded batches
      Sources.restProduce(
        (30 until 80).map(i => (s"k$i", s"v$i")).toDF("k", "v"), url, "lp",
        col("k"), col("v"), pmod(xxhash64(col("k")), lit(2)))
      var total = 0L
      val nb = Sources.restIngestDrain(spark, url, "lp", cdir,
                                       maxPerPartition = 10L) { df =>
        val n = df.count(); assert(n <= 20); total += n
      }
      assert(total == 50L && nb >= 3)
      assert(Sources.readRestCursor(spark, cdir).values.sum == 80L)
    }
  }

  test("graft-rest readStream source: engine-checkpointed offsets resume " +
       "exactly-once across restart, admission cap bounds each trigger") {
    withServer(numPartitions = 2) { (_, c) =>
      val url = c.baseUrl
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-rest-ckpt").toString
      val out = java.nio.file.Files
        .createTempDirectory("graft-rest-out").toString + "/sink"
      def produce(lo: Int, hi: Int): Unit = Sources.restProduce(
        (lo until hi).map(i => (s"k$i", s"v$i")).toDF("k", "v"), url, "st",
        col("k"), col("v"), pmod(xxhash64(col("k")), lit(2)))
      def runOnce(): Unit = {
        val q = spark.readStream.format("graft-rest")
          .option("url", url).option("topic", "st")
          .option("maxRecordsPerPartition", "7")
          .load()
          .writeStream.format("parquet")
          .option("checkpointLocation", ckpt)
          .option("path", out)
          .start()
        q.processAllAvailable()
        q.stop()
      }
      produce(0, 40)
      runOnce()
      produce(40, 60) // arrives while the stream is DOWN
      runOnce()       // restart resumes from the checkpointed offsets
      val got = spark.read.parquet(out)
      assert(got.count() == 60)
      assert(got.select(col("value").cast("string")).as[String]
        .collect().sorted.toSeq == (0 until 60).map(i => s"v$i").sorted)
      assert(got.select("partition", "offset").distinct().count() == 60,
             "offsets must be unique — no redelivered batch in the sink")
      // the per-partition admission cap forces multiple triggers
      val commits = new java.io.File(s"$ckpt/commits")
        .list().count(!_.startsWith("."))
      assert(commits >= 4, s"expected >=4 capped triggers, got $commits")
    }
  }

  test("HttpSchemaRegistry resolves ids over real HTTP and caches per id") {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/schemas/ids/", (ex: com.sun.net.httpserver.HttpExchange) => {
      hits.incrementAndGet()
      val id = ex.getRequestURI.getPath.split("/").last.toInt
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = mapper.createObjectNode()
      node.put("schema",
        s"""{"type":"record","name":"r$id","fields":[]}""")
      val bytes = mapper.writeValueAsBytes(node)
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    srv.start()
    try {
      val reg = Sources.HttpSchemaRegistry(
        s"http://127.0.0.1:${srv.getAddress.getPort}")
      assert(reg(7).contains("\"name\":\"r7\""))
      assert(reg(7).contains("\"name\":\"r7\"")) // served from cache
      assert(reg(9).contains("\"name\":\"r9\""))
      assert(hits.get() == 2, "one HTTP fetch per distinct id")
    } finally srv.stop(0)
  }
}
