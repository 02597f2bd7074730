package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Mechanical crash-site sweep over every incremental sink's batch
  * function: a [[FaultFs]] run first COUNTS every mutating FS operation
  * (create / rename / delete — Spark committer boundaries included),
  * then for op index k = 1..N the batch sequence re-runs with a crash
  * armed at k (plus a partial-delete variant at every recursive delete
  * and an empty-file variant at every create), the crashed batch
  * replays exactly as the streaming engine would redeliver it, and the
  * final observable state must equal the no-crash reference run
  * bit-for-bit. Any failing site is a real torn-write bug — this is
  * the generalization of the hand-picked crash-window tests in
  * StreamingSpec to EVERY boundary.
  *
  * Not swept here: multiTableBatch (a composition of the swept
  * upsertBatch per leg plus at-least-once diagnostic quarantine
  * appends) and jdbcUpsertStreamSink (JDBC, not a filesystem).
  */
class CrashInjectionSpec extends SparkSpec {

  import spark.implicits._

  private lazy val fsRegistered: Unit =
    spark.sparkContext.hadoopConfiguration
      .set("fs.fault.impl", "graft.FaultFs")

  private def fs = new org.apache.hadoop.fs.Path("fault:///tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def wipe(dir: String): Unit =
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def pq(path: String): Seq[String] =
    try rows(spark.read.parquet(path))
    catch { case _: Exception => Seq(s"<unreadable>") }

  private def markers(dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_graft_commits")
    if (!fs.exists(p)) Seq("<no-markers>")
    else fs.listStatus(p).map("marker:" + _.getPath.getName).sorted.toSeq
  }

  /** One sink under sweep: `run(root, i)` drives batch i against state
    * dirs under `root`; `observe(root)` canonicalizes the final state
    * (through the sink's documented consumer read path where one
    * exists).
    */
  private case class SinkCase(name: String, nBatches: Int,
                              run: (String, Int) => Unit,
                              observe: String => Seq[String])

  // ---- tiny deterministic fixtures ----------------------------------

  private def vecs(ids: Seq[Int]): DataFrame =
    spark.createDataFrame(ids.map { k =>
      (k.toLong, Array.tabulate(8)(i =>
        (((k * 31 + i * 7) % 13) - 6) * 0.05f))
    }).toDF("vec_id", "embedding")

  private def docs(i: Int): DataFrame = {
    val texts = Seq(
      Seq(10L -> "aa bb cc dd", 11L -> "bb cc dd ee"),
      Seq(20L -> "aa bb cc dd", 21L -> "ee ff gg aa"),
      Seq(30L -> "bb cc dd ee", 31L -> "gg hh ii jj"))(i)
    texts.toDF("doc", "text")
  }

  private val sinks: Seq[SinkCase] = Seq(
    SinkCase("append", 2,
      (root, i) => {
        val b = Seq((i.toLong, s"r$i-a"), (i.toLong, s"r$i-b"))
          .toDF("id", "s")
        if (!Streaming.alreadyCommitted(spark, s"$root/out", i)) {
          Streaming.idempotentAppend(b, s"$root/out", i)
          Streaming.markCommitted(spark, s"$root/out", i)
        }
      },
      root => pq(s"$root/out") ++ markers(s"$root/out")),

    SinkCase("upsert", 2,
      (root, i) => {
        val b = Seq(
          Seq((1L, 1L, "x"), (2L, 1L, "y"), (5L, 1L, "q")),
          Seq((1L, 2L, "x2"), (3L, 1L, "z")))(i)
          .toDF("id", "ver", "payload")
        Streaming.upsertBatch(b, s"$root/state", Seq("id"), Seq("ver"), 2)
      },
      root => rows(Streaming.readUpsertState(spark, s"$root/state"))),

    SinkCase("projection", 2,
      (root, i) => {
        val b = Seq((s"k${i % 2}", 10L * i + 1), ("k1", 10L * i + 2))
          .toDF("k", "v")
        Streaming.projectionBatch(b, s"$root/base", s"$root/proj",
                                  Seq("k"), Seq("v"), i)
      },
      root => pq(s"$root/base") ++ pq(s"$root/proj") ++
              markers(s"$root/base")),

    SinkCase("scatter", 2,
      (root, i) => Streaming.scatterBatch(
        vecs(Seq(Seq(0, 1, 2), Seq(3, 4))(i)), s"$root/st", i),
      root => pq(s"$root/st/scatter") ++ markers(s"$root/st")),

    SinkCase("kmeans", 3,
      // batch 0 is sub-k (1 vector, k=2): exercises the pending stash
      (root, i) => Streaming.kmeansBatch(
        vecs(Seq(Seq(0), Seq(1, 2, 3), Seq(4, 5))(i)),
        s"$root/st", 2, i),
      root => pq(s"$root/st/centroids") ++ markers(s"$root/st")),

    SinkCase("invertedIndex", 3,
      // compactEvery=2: batch 2 compacts batches 0+1 at its start
      (root, i) => Streaming.invertedIndexBatch(
        docs(i), "doc", "text", s"$root/st", 2, 2, i),
      root => pq(s"$root/st/postings") ++ pq(s"$root/st/stats") ++
              markers(s"$root/st") ++
              rows(Streaming.bm25FromIndexState(
                spark, s"$root/st", Seq("aa", "gg"), numBuckets = 2))),

    SinkCase("substrCoverage", 3,
      (root, i) => Streaming.substrCoverageBatch(
        docs(i), "doc", "text", s"$root/out", s"$root/store",
        w = 5, stride = 1, numBuckets = 2, compactEvery = 2, i),
      root => pq(s"$root/out") ++ pq(s"$root/store") ++
              markers(s"$root/out")),

    SinkCase("zscore", 3,
      (root, i) => {
        val b = Seq(
          (0 until 5).map(j => ("a", j.toLong, j.toLong, 10L)),
          (5 until 9).map(j => ("a", j.toLong, j.toLong,
                                if (j == 8) 100L else 10L)),
          (9 until 12).map(j => ("a", j.toLong, j.toLong, 10L)))(i)
          .toDF("k", "ts", "tie", "v")
        Streaming.zscoreAlertBatch(b, s"$root/out", s"$root/store",
                                   "k", "ts", "tie", "v", lookback = 4,
                                   minN = 2, sigma = 2, numBuckets = 2,
                                   compactEvery = 2, i)
      },
      root => pq(s"$root/out") ++ pq(s"$root/store") ++
              markers(s"$root/out")),

    SinkCase("dedupHistory", 3,
      (root, i) => {
        val b = Seq(Seq("aa", "bb", "aa"), Seq("bb", "cc"),
                    Seq("aa", "dd"))(i).toDF("text")
        Streaming.dedupHistoryBatch(b, "text", s"$root/out",
                                    s"$root/store", numBuckets = 2,
                                    compactEvery = 2, i)
      },
      root => pq(s"$root/out") ++ pq(s"$root/store") ++
              markers(s"$root/out")),

    SinkCase("incrementalAgg", 3,
      (root, i) => {
        val b = Seq(
          Seq(("d1", "x", 1.0), ("d2", "y", 2.0)),
          Seq(("d1", "x", 3.0), ("d1", "y", 4.0)),
          Seq(("d2", "x", 5.0)))(i).toDF("day", "et", "v")
        Streaming.incrementalAggBatch(b, s"$root/st", "day", Seq("et"),
                                      "v", compactEvery = 2, i)
      },
      root => {
        // the documented consumer step before reading a compacted store
        Sources.recoverCompactedDir(spark, s"$root/st")
        pq(s"$root/st") ++ markers(s"$root/st")
      }),

    SinkCase("incrementalDistinct", 3,
      (root, i) => {
        val b = Seq(
          Seq(("d1", "x", 100L), ("d1", "x", 101L)),
          Seq(("d1", "x", 100L), ("d2", "y", 200L)),
          Seq(("d1", "x", 102L)))(i).toDF("day", "et", "uid")
        Streaming.incrementalDistinctBatch(b, s"$root/st", "day",
                                           Seq("et"), "uid",
                                           compactEvery = 2, i)
      },
      // sketch BYTES don't canonicalize through Row.toString — observe
      // through the public estimate read (the consumer path)
      root => rows(Streaming.distinctEstimates(spark, s"$root/st")
                     .select("day", "et", "approx_distinct")) ++
              markers(s"$root/st")),

    SinkCase("incrementalTopK", 3,
      (root, i) => {
        val b = Seq(
          Seq(("d1", "p1"), ("d1", "p1"), ("d1", "p2")),
          Seq(("d1", "p1"), ("d2", "p3")),
          Seq(("d1", "p2"), ("d1", "p2")))(i).toDF("day", "item")
        Streaming.incrementalTopKBatch(b, s"$root/st", "day", Nil,
                                       "item", maxItemsTracked = 8,
                                       compactEvery = 2, i)
      },
      root => rows(Streaming.topKEstimates(spark, s"$root/st", 2)) ++
              markers(s"$root/st")),

    SinkCase("incrementalEma", 2,
      (root, i) => {
        val b = Seq(
          Seq(("a", 0L, 0L, 10.0), ("b", 0L, 0L, 5.0)),
          Seq(("a", 1L, 1L, 20.0)))(i).toDF("k", "ts", "tie", "v")
        Streaming.incrementalEmaBatch(b, s"$root/st", "k", "ts", "tie",
                                      "v", alpha = 0.5, numBuckets = 2, i)
      },
      root => rows(Streaming.readEmaState(spark, s"$root/st")) ++
              markers(s"$root/st")),

    // S9 ingest loop: consume-from-committed-cursor → upsert → commit
    // cursor. The proxy stand-in lives OUTSIDE the faulted filesystem
    // (broker state survives the crash, as a real broker's does); the
    // swept boundaries are the store's staged swap plus the cursor's
    // tmp-create → rename → prune sequence. Replay contract: a crash
    // before the cursor commit redelivers the batch from the previous
    // committed offsets (at-least-once), the versioned upsert absorbs
    // the redelivery, and the cursor CONTENT (not its version count)
    // converges to the produced end offsets.
    SinkCase("restIngest", 3,
      (root, i) => {
        // topic derived from the full root string: every crash branch
        // gets its own broker log, with no hash-collision risk of two
        // branches sharing (and double-counting) one
        val topic = "t" + root.replaceAll("[^A-Za-z0-9]", "_")
        val c = RestProxy.Client(restStubUrl)
        val batches = Seq(
          Seq((1L, 1L, "x"), (2L, 1L, "y")),
          Seq((1L, 2L, "x2"), (3L, 1L, "z")),
          Seq((2L, 2L, "y2")))
        // produce is idempotent per batch index: on a replay the
        // records are already in the (unfaulted) broker log
        val have =
          try c.partitions(topic).map(p => c.offsets(topic, p)._2).sum
          catch { case _: java.io.IOException => 0L }
        if (have < batches.take(i + 1).map(_.size).sum)
          c.produce(topic, batches(i).iterator.map { case (id, ver, v) =>
            (id.toString.getBytes("UTF-8"),
             s"$id:$ver:$v".getBytes("UTF-8"),
             java.lang.Integer.valueOf((id % 2).toInt))
          })
        Sources.restIngestBatch(spark, restStubUrl, topic,
                                s"$root/cursor") { df =>
          val parsed = df
            .select(split(col("value").cast("string"), ":").as("f"))
            .select(col("f")(0).cast("long").as("id"),
                    col("f")(1).cast("long").as("ver"),
                    col("f")(2).as("payload"))
          Streaming.upsertBatch(parsed, s"$root/state",
                                Seq("id"), Seq("ver"), 2)
        }
        ()
      },
      root => rows(Streaming.readUpsertState(spark, s"$root/state")) ++
        Seq("cursor:" + Sources.readRestCursor(spark, s"$root/cursor")
          .toSeq.sorted.mkString(",")))
  )

  private lazy val restStubUrl: String =
    new RestProxy.InMemoryServer(numPartitions = 2).start()

  private def isInjected(t: Throwable): Boolean = FaultFs.caused(t)

  // ---- 15th family: the DSv2 graft-rest STREAMING path --------------
  // The preceding families sweep the engine's own staged-swap and
  // cursor disciplines; q_rest_stream's durability instead rides
  // Spark-owned files — the streaming checkpoint's offset/commit logs
  // (HDFSMetadataLog temp-create → rename) and the file sink's
  // _spark_metadata manifest. Pointing checkpoint AND sink at fault://
  // sweeps a crash at every one of those boundaries across a
  // stop/produce/restart seam; the resumed query must land the exact
  // no-crash sink state (the manifest is the sink's exactly-once
  // read view, so a replayed trigger must not double its rows).
  test("crash sweep: restStream — Spark offset/commit logs and sink " +
       "manifest on fault://, resume converges across a restart seam") {
    fsRegistered
    val base = "fault:///tmp/graft-crash/restStream"
    wipe(base)

    def topicOf(root: String) = "t" + root.replaceAll("[^A-Za-z0-9]", "_")

    // broker state lives OUTSIDE the faulted filesystem (a real
    // broker's does); produce is idempotent per wave via end offsets
    def produceIdempotent(topic: String, upto: Long, lo: Int,
                          hi: Int): Unit = {
      val c = RestProxy.Client(restStubUrl)
      val have =
        try c.partitions(topic).map(p => c.offsets(topic, p)._2).sum
        catch { case _: java.io.IOException => 0L }
      if (have < upto)
        c.produce(topic, (lo until hi).iterator.map(i =>
          (s"k$i".getBytes("UTF-8"), s"v$i".getBytes("UTF-8"),
           java.lang.Integer.valueOf(i % 2))))
    }

    def runStream(root: String, topic: String): Unit = {
      val q = spark.readStream.format("graft-rest")
        .option("url", restStubUrl).option("topic", topic)
        .option("maxRecordsPerPartition", "4") // multiple triggers/run
        .load()
        .selectExpr("partition", "offset", "CAST(value AS STRING) AS v")
        .writeStream.format("parquet")
        .option("checkpointLocation", s"$root/ckpt")
        .option("path", s"$root/out")
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    def run(root: String): Unit = {
      val topic = topicOf(root)
      produceIdempotent(topic, 15, 0, 15)
      runStream(root, topic)
      produceIdempotent(topic, 25, 15, 25) // arrives across the seam
      runStream(root, topic)
    }

    // reading the out dir consults _spark_metadata — the documented
    // exactly-once consumer view of a file-sink table
    def observe(root: String): Seq[String] = pq(s"$root/out")

    val refRoot = s"$base/ref"
    run(refRoot)
    val want = observe(refRoot)
    assert(want.size == 25, s"reference run must sink 25 rows: $want")

    val cntRoot = s"$base/cnt"
    FaultFs.startCounting("/restStream/cnt/")
    run(cntRoot)
    val total = FaultFs.counter.get()
    val kinds = (1L to total)
      .map(k => FaultFs.ops.getOrDefault(k, "?")).toVector
    FaultFs.disarm()
    // streaming logs + manifest commit via temp-create → rename; the
    // file sink never stages through _temporary dirs, so deletes are
    // not required to appear
    assert(total > 0 && kinds.contains("create") &&
           kinds.contains("rename"),
           s"expected create+rename among $total ops: " +
             kinds.distinct.mkString(","))
    assert(observe(cntRoot) === want)

    var swept = 0
    var fired = 0
    for (k <- 1L to total) {
      val modes = Seq("before") ++
        (if (kinds(k.toInt - 1) == "delete") Seq("partial-delete")
         else Nil) ++
        (if (kinds(k.toInt - 1) == "create") Seq("empty-create")
         else Nil)
      for (m <- modes) {
        val tag = s"k$k-$m"
        val root = s"$base/$tag"
        FaultFs.arm(s"/restStream/$tag/", k, m)
        var crashed = false
        try run(root)
        catch {
          case t: Throwable if isInjected(t) => crashed = true
          case t: Throwable => FaultFs.disarm(); throw t
        }
        FaultFs.disarm()
        if (crashed) {
          fired += 1
          // the restart runbook: clear torn temp/trailing artifacts the
          // crash left in the Spark-owned logs, then resume
          Streaming.recoverStreamingCheckpoint(spark, s"$root/ckpt",
                                               Some(s"$root/out"))
          run(root)
        }
        assert(observe(root) === want,
               s"site $k mode $m diverged (crash fired=$crashed)")
        swept += 1
        wipe(root)
      }
    }
    assert(fired > 0, "no armed site ever fired — marker mismatch?")
    info(s"restStream: $swept runs over $total ops, $fired crashes fired")
    wipe(base)
  }

  // ---- 16th family: the DSv2 graft-jdbc STREAMING path --------------
  // Same Spark-owned durability surface as restStream (offset/commit
  // logs, file-sink manifest) but with the polling-CDC source's cursor
  // offsets riding the checkpoint; the Derby feed lives OUTSIDE the
  // faulted filesystem, as a real database's state does. Seeding is
  // idempotent per wave via row counts, the seam splits on cursor
  // value (the source's append-only contract).
  test("crash sweep: jdbcStream — cursor offsets in Spark's checkpoint " +
       "on fault://, resume converges across a restart seam") {
    fsRegistered
    val base = "fault:///tmp/graft-crash/jdbcStream"
    wipe(base)
    val url = "jdbc:derby:memory:graftcrash;create=true"

    def exec(sql: String): Unit = {
      val c = java.sql.DriverManager.getConnection(url)
      try { val st = c.createStatement(); st.execute(sql); st.close() }
      finally c.close()
    }
    def count(table: String): Long = {
      val c = java.sql.DriverManager.getConnection(url)
      try {
        val st = c.createStatement()
        val rs = st.executeQuery(s"SELECT COUNT(*) FROM $table")
        rs.next(); rs.getLong(1)
      } catch { case _: java.sql.SQLException => -1L }
      finally c.close()
    }
    def tableOf(root: String) =
      "t" + Integer.toHexString(root.hashCode).replace('-', 'm')

    def seedIdempotent(table: String, upto: Int, lo: Int,
                       hi: Int): Unit = {
      if (count(table) < 0)
        exec(s"CREATE TABLE $table (seq BIGINT NOT NULL, v VARCHAR(20))")
      if (count(table) < upto)
        (lo until hi).foreach(i =>
          exec(s"INSERT INTO $table VALUES ($i, 'v$i')"))
    }

    def runStream(root: String, table: String): Unit = {
      val q = spark.readStream.format("graft-jdbc")
        .option("url", url).option("table", table)
        .option("cursorColumn", "seq")
        .option("maxRowsPerBatch", "4") // multiple triggers/run
        .option("numPartitions", "2")
        .load()
        .selectExpr("seq", "v")
        .writeStream.format("parquet")
        .option("checkpointLocation", s"$root/ckpt")
        .option("path", s"$root/out")
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    def run(root: String): Unit = {
      val table = tableOf(root)
      seedIdempotent(table, 15, 0, 15)
      runStream(root, table)
      seedIdempotent(table, 25, 15, 25) // arrives across the seam
      runStream(root, table)
    }

    def observe(root: String): Seq[String] = pq(s"$root/out")

    val refRoot = s"$base/ref"
    run(refRoot)
    val want = observe(refRoot)
    assert(want.size == 25, s"reference run must sink 25 rows: $want")

    val cntRoot = s"$base/cnt"
    FaultFs.startCounting("/jdbcStream/cnt/")
    run(cntRoot)
    val total = FaultFs.counter.get()
    val kinds = (1L to total)
      .map(k => FaultFs.ops.getOrDefault(k, "?")).toVector
    FaultFs.disarm()
    assert(total > 0 && kinds.contains("create") &&
           kinds.contains("rename"),
           s"expected create+rename among $total ops: " +
             kinds.distinct.mkString(","))
    assert(observe(cntRoot) === want)

    var swept = 0
    var fired = 0
    for (k <- 1L to total) {
      val modes = Seq("before") ++
        (if (kinds(k.toInt - 1) == "delete") Seq("partial-delete")
         else Nil) ++
        (if (kinds(k.toInt - 1) == "create") Seq("empty-create")
         else Nil)
      for (m <- modes) {
        val tag = s"k$k-$m"
        val root = s"$base/$tag"
        FaultFs.arm(s"/jdbcStream/$tag/", k, m)
        var crashed = false
        try run(root)
        catch {
          case t: Throwable if isInjected(t) => crashed = true
          case t: Throwable => FaultFs.disarm(); throw t
        }
        FaultFs.disarm()
        if (crashed) {
          fired += 1
          Streaming.recoverStreamingCheckpoint(spark, s"$root/ckpt",
                                               Some(s"$root/out"))
          run(root)
        }
        assert(observe(root) === want,
               s"site $k mode $m diverged (crash fired=$crashed)")
        swept += 1
        wipe(root)
      }
    }
    assert(fired > 0, "no armed site ever fired — marker mismatch?")
    info(s"jdbcStream: $swept runs over $total ops, $fired crashes fired")
    wipe(base)
  }

  for (sc <- sinks) test(s"crash sweep: ${sc.name} — replay converges " +
                         "bit-for-bit from every FS boundary") {
    fsRegistered
    val base = s"fault:///tmp/graft-crash/${sc.name}"
    wipe(base)

    // no-crash reference
    val refRoot = s"$base/ref"
    (0 until sc.nBatches).foreach(i => sc.run(refRoot, i))
    val want = sc.observe(refRoot)
    assert(want.exists(s => !s.startsWith("<")),
           s"reference run produced no observable state: $want")

    // counting run: records N mutating ops and their kinds; its final
    // state doubles as a determinism check of the fixture
    val cntRoot = s"$base/cnt"
    FaultFs.startCounting(s"/${sc.name}/cnt/")
    (0 until sc.nBatches).foreach(i => sc.run(cntRoot, i))
    val total = FaultFs.counter.get()
    val kinds = (1L to total)
      .map(k => FaultFs.ops.getOrDefault(k, "?")).toVector
    FaultFs.disarm()
    assert(total > 0 && kinds.contains("create") &&
           kinds.contains("rename") && kinds.contains("delete"),
           s"expected create+rename+delete among $total ops: " +
             kinds.distinct.mkString(","))
    assert(sc.observe(cntRoot) === want)

    var swept = 0
    var fired = 0
    for (k <- 1L to total) {
      val modes = Seq("before") ++
        (if (kinds(k.toInt - 1) == "delete") Seq("partial-delete")
         else Nil) ++
        (if (kinds(k.toInt - 1) == "create") Seq("empty-create")
         else Nil)
      for (m <- modes) {
        val tag = s"k$k-$m"
        val root = s"$base/$tag"
        FaultFs.arm(s"/${sc.name}/$tag/", k, m)
        var crashed = false
        try (0 until sc.nBatches).foreach(i => sc.run(root, i))
        catch {
          case t: Throwable if isInjected(t) => crashed = true
          case t: Throwable => FaultFs.disarm(); throw t
        }
        FaultFs.disarm()
        if (crashed) {
          fired += 1
          // redeliver every batch, as the engine would from its
          // checkpoint: committed ones must no-op, the in-flight one
          // must recover and complete
          (0 until sc.nBatches).foreach(i => sc.run(root, i))
        }
        assert(sc.observe(root) === want,
               s"site $k mode $m diverged (crash fired=$crashed)")
        swept += 1
        wipe(root)
      }
    }
    assert(fired > 0, "no armed site ever fired — marker mismatch?")
    info(s"${sc.name}: $swept runs over $total ops, $fired crashes fired")
    wipe(base)
  }
}
