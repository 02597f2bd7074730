package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** T1-T8 streaming behavior via MemoryStream: batch/stream parity (the
  * reference's MV-vs-table equivalence), watermarked dedup, stateful
  * processing, and the append sink (SURVEY.md §5.4).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def eventRows = Seq(
    (1L, ts("2024-01-01 00:01:00"), "click", 1.0),
    (1L, ts("2024-01-01 00:04:00"), "click", 2.0),
    (1L, ts("2024-01-01 00:12:00"), "view", 3.0),
    (2L, ts("2024-01-01 00:03:00"), "click", 4.0),
    (2L, ts("2024-01-01 00:03:00"), "click", 4.0) // duplicate delivery
  )

  private def toDf(rows: Seq[(Long, Timestamp, String, Double)]) =
    rows.toDF("user_id", "ts", "event_type", "value")

  test("T1/T2: appendSink writes each micro-batch to parquet exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft-sink").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val stream = MemoryStream[(Long, Timestamp, String, Double)]
    val q = Streaming.appendSink(
      toDfStream(stream), out, ckpt).start()
    stream.addData(eventRows.take(3))
    q.processAllAvailable()
    stream.addData(eventRows.drop(3))
    q.processAllAvailable()
    q.stop()
    assert(spark.read.parquet(out).count() === 5)
  }

  private def toDfStream(ms: MemoryStream[(Long, Timestamp, String, Double)]) =
    ms.toDF().toDF("user_id", "ts", "event_type", "value")

  test("T3: tumbling counts — stream result equals batch result") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String, Double)]
    stream.addData(eventRows)
    val agg = Streaming.watermarkedTumblingCounts(
      toDfStream(stream), "ts", "10 minutes", "1 hour")
    val q = agg.writeStream.format("memory").queryName("tumbling")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("tumbling")
      .orderBy("w_start", "event_type").collect()
    val batch = Streaming.tumblingCounts(toDf(eventRows), col("ts"),
                                         "10 minutes")
      .orderBy("w_start", "event_type").collect()
    assert(streamed === batch)
  }

  test("T7: streaming dedup drops the duplicate delivery") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String, Double)]
    stream.addData(eventRows)
    val dedup = Streaming.streamingDedup(toDfStream(stream), "ts", "1 hour",
                                         Seq("user_id"))
    val q = dedup.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dedup").count() === 4)
  }

  test("T8: mapGroupsWithState accumulates per-user totals across batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String, Double)]
    val totals = Streaming.runningUserTotals(toDfStream(stream))
    val q = totals.writeStream.format("memory").queryName("totals")
      .outputMode("update").start()
    stream.addData(eventRows.take(2)) // user1: 2 events
    q.processAllAvailable()
    stream.addData(eventRows.drop(2)) // user1 +1, user2 +2
    q.processAllAvailable()
    q.stop()
    // the final update per user carries the accumulated state
    val byUser = spark.table("totals").as[(Long, Long, Double)].collect()
      .groupBy(_._1).map { case (u, rows) => u -> rows.maxBy(_._2) }
    assert(byUser(1L) === ((1L, 3L, 6.0)))
    assert(byUser(2L) === ((2L, 2L, 8.0)))
  }

  test("T8b: flatMapGroupsWithState emits one alert per crossed threshold") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String, Double)]
    val alerts = Streaming.thresholdAlerts(toDfStream(stream), 5.0)
    val q = alerts.writeStream.format("memory").queryName("alerts")
      .outputMode("append").start()
    stream.addData(eventRows.take(2)) // user1 total 3.0 → no alert
    q.processAllAvailable()
    stream.addData(eventRows.drop(2)) // user1 → 6.0 (level 1); user2 → 8.0
    q.processAllAvailable()
    q.stop()
    val out = spark.table("alerts").as[(Long, Long, Double)].collect().toSet
    assert(out === Set((1L, 1L, 6.0), (2L, 1L, 8.0)))
  }

  test("T1+U1: upsertSink maintains latest state per key across batches") {
    implicit val sqlCtx = spark.sqlContext
    val state = Files.createTempDirectory("graft-upsert").toString + "/state"
    val ckpt = Files.createTempDirectory("graft-upsert-ckpt").toString
    val stream = MemoryStream[(Long, Timestamp, String, Double)]
    val q = Streaming.upsertSink(toDfStream(stream), state, ckpt,
                                 Seq("user_id"), Seq("ts")).start()
    stream.addData(Seq((1L, ts("2024-01-01 00:01:00"), "bronze", 1.0),
                       (2L, ts("2024-01-01 00:02:00"), "silver", 2.0)))
    q.processAllAvailable()
    stream.addData(Seq((1L, ts("2024-01-01 00:05:00"), "gold", 3.0)))
    q.processAllAvailable()
    q.stop()
    val out = Streaming.readUpsertState(spark, state).orderBy("user_id")
      .select("user_id", "event_type").as[(Long, String)].collect()
    assert(out === Array((1L, "gold"), (2L, "silver")))
  }

  test("T1+U1: a 1-key micro-batch rewrites exactly its own state bucket") {
    implicit val sqlCtx = spark.sqlContext
    val state = Files.createTempDirectory("graft-upsertb").toString + "/state"
    val ckpt = Files.createTempDirectory("graft-upsertb-ckpt").toString
    val numBuckets = 8
    val stream = MemoryStream[(Long, Timestamp, String, Double)]
    val q = Streaming.upsertSink(toDfStream(stream), state, ckpt,
                                 Seq("user_id"), Seq("ts"), numBuckets).start()
    // batch 1: 16 keys spread over the buckets
    stream.addData((1L to 16L).map(u =>
      (u, ts("2024-01-01 00:01:00"), "bronze", u.toDouble)))
    q.processAllAvailable()
    def bucketFiles(): Map[String, Set[String]] = {
      val root = new java.io.File(state)
      root.listFiles().filter(_.getName.startsWith("__bucket=")).map { d =>
        d.getName -> d.listFiles().map(_.getName)
          .filter(_.startsWith("part-")).toSet
      }.toMap
    }
    val before = bucketFiles()
    assert(before.size > 1, "16 keys should touch more than one bucket")
    // batch 2: a single key
    stream.addData(Seq((7L, ts("2024-01-01 00:09:00"), "gold", 99.0)))
    q.processAllAvailable()
    q.stop()
    val after = bucketFiles()
    val changed = (before.keySet ++ after.keySet)
      .filter(b => before.get(b) != after.get(b))
    // exactly ONE bucket dir rewritten — the one key 7 hashes into
    val expected = spark.range(1).select(
      pmod(xxhash64(lit(7L)), lit(numBuckets)).cast("int")).as[Int].head()
    assert(changed === Set(s"__bucket=$expected"))
    // and the merged state is still exactly the latest row per key
    val out = Streaming.readUpsertState(spark, state)
      .select("user_id", "event_type").as[(Long, String)].collect().toMap
    assert(out(7L) === "gold")
    assert(out.size === 16 && out.count(_._2 == "bronze") === 15)
  }

  test("stream-static enrichment join matches the batch join, broadcast") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "premium"), (2L, "basic")).toDF("user_id", "segment")
    val stream = MemoryStream[(Long, Timestamp, String, Double)]
    val enriched = Streaming.enrich(toDfStream(stream), dim, Seq("user_id"))
    val q = enriched.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    stream.addData(eventRows)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("enriched")
      .select("user_id", "event_type", "segment")
      .as[(Long, String, String)].collect().sorted
    val expected = Streaming.enrich(toDf(eventRows), dim, Seq("user_id"))
      .select("user_id", "event_type", "segment")
      .as[(Long, String, String)].collect().sorted
    assert(got === expected && got.nonEmpty)
    // the static side is broadcast: no shuffle on the stream side
    val plan = Streaming.enrich(toDf(eventRows), dim, Seq("user_id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("dedup-against-history: cross-batch duplicates dropped, store " +
       "buckets append-only") {
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft-hist").toString + "/out"
    val store = Files.createTempDirectory("graft-hist").toString + "/store"
    val ckpt = Files.createTempDirectory("graft-hist-ckpt").toString
    val stream = MemoryStream[String]
    val q = Streaming.dedupAgainstHistorySink(
      stream.toDF().toDF("text"), "text", out, store, ckpt, numBuckets = 4)
      .start()
    stream.addData(Seq("aa", "bb", "aa")) // in-batch dup
    q.processAllAvailable()
    stream.addData(Seq("bb", "cc"))       // cross-batch dup + novel
    q.processAllAvailable()
    stream.addData(Seq("aa", "bb"))       // nothing novel
    q.processAllAvailable()
    q.stop()
    val kept = spark.read.parquet(out).select("text").as[String]
      .collect().sorted
    assert(kept === Array("aa", "bb", "cc")) // each text exactly once
    // the store holds exactly one hash per distinct text, bucketed
    val storeDf = spark.read.parquet(store)
    assert(storeDf.count() === 3)
    assert(storeDf.select("__h").distinct().count() === 3)
  }

  test("history-store compaction every Nth batch collapses file counts " +
       "without changing dedup results") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-hc").toString
    val out = base + "/out"
    val store = base + "/store"
    val ckpt = Files.createTempDirectory("graft-hc-ckpt").toString
    val stream = MemoryStream[String]
    val q = Streaming.dedupAgainstHistorySink(
      stream.toDF().toDF("text"), "text", out, store, ckpt,
      numBuckets = 2, compactEvery = 4).start()
    Seq(Seq("aa", "bb"), Seq("cc", "dd"), Seq("ee", "ff"),
        Seq("gg", "hh")).foreach { b =>
      stream.addData(b); q.processAllAvailable()
    }
    val filesBefore = Sources.dataFileCount(spark, store) // 4 appends
    assert(filesBefore >= 4) // one+ file per append — the growth problem
    // batch 4 compacts batches 0-3 into batch=-1 at its START, then
    // writes its own novel partition — dedup behaves identically
    stream.addData(Seq("aa", "gg", "ii")) // two known, one novel
    q.processAllAvailable()
    q.stop()
    val filesAfter = Sources.dataFileCount(spark, store)
    // ≤ one file per hive bucket under batch=-1 + batch 4's own novel
    // partition (≤ one file per touched bucket)
    assert(filesAfter <= 4,
           s"expected <= 4 files after compaction, got $filesAfter")
    val kept = spark.read.parquet(out).select("text").as[String]
      .collect().sorted
    assert(kept === Array("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh",
                          "ii"))
    val storeDf = spark.read.parquet(store)
    assert(storeDf.count() === 9)
    assert(storeDf.select("__h").distinct().count() === 9)
  }

  test("incremental aggregate sink: merges partials per partition, " +
       "rewrites only touched days") {
    implicit val sqlCtx = spark.sqlContext
    val state = Files.createTempDirectory("graft-iagg").toString + "/state"
    val ckpt = Files.createTempDirectory("graft-iagg-ckpt").toString
    val stream = MemoryStream[(Long, Timestamp, String, Double)]
    val withDay = Streaming.mvTransform(toDfStream(stream), Seq.empty)
      .withColumn("day", to_date(col("ts")))
    val q = Streaming.incrementalAggSink(withDay, state, ckpt,
      "day", Seq("event_type"), "value").start()
    stream.addData(Seq(
      (1L, ts("2024-01-01 01:00:00"), "click", 1.0),
      (2L, ts("2024-01-01 02:00:00"), "click", 2.0),
      (3L, ts("2024-01-02 01:00:00"), "view", 4.0)))
    q.processAllAvailable()
    def dayFiles(d: String): Set[String] = {
      val dir = new java.io.File(s"$state/day=$d")
      if (!dir.exists()) Set.empty
      else dir.listFiles().map(_.getName).filter(_.startsWith("part-")).toSet
    }
    val day1Before = dayFiles("2024-01-01")
    // batch 2 touches ONLY day 2: day 1 partition must not be rewritten
    stream.addData(Seq((4L, ts("2024-01-02 03:00:00"), "view", 8.0)))
    q.processAllAvailable()
    q.stop()
    assert(dayFiles("2024-01-01") === day1Before)
    val out = spark.read.parquet(state)
      .select(col("day").cast("string"), col("event_type"), col("n"),
              col("sum_value"))
      .as[(String, String, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(out === Array(
      ("2024-01-01", "click", 2L, 3.0),
      ("2024-01-02", "view", 2L, 12.0)))
  }

  test("mergeTouchedPartitions: a replay that finds the completeness " +
       "tag RESUMES the swap instead of recomputing — the interrupted " +
       "partition lands, the already-swapped one is not double-merged") {
    val st = Files.createTempDirectory("graft-mtp").toString + "/state"
    val fs = new org.apache.hadoop.fs.Path(st)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    // batch 0 seeds two partitions with n=1 each
    Streaming.mergeTouchedPartitions(spark, st, "part", 0L) {
      Seq((0, 1L), (1, 1L)).toDF("part", "n")
    }
    assert(spark.read.parquet(st).select("part", "n")
      .as[(Int, Long)].collect().toSet === Set((0, 1L), (1, 1L)))
    // simulate batch 1 crashing MID-SWAP: the staged merge (n=2 for
    // both partitions, computed from pre-batch state) is complete and
    // tagged; partition part=0 already swapped in; part=1 still staged;
    // no marker yet
    val tmp = s"$st.merge_batch=1"
    Seq((0, 2L), (1, 2L)).toDF("part", "n")
      .write.mode("overwrite").partitionBy("part").parquet(tmp)
    fs.create(p(s"$tmp/_complete"), true).close()
    fs.delete(p(s"$st/part=0"), true)
    fs.rename(p(s"$tmp/part=0"), p(s"$st/part=0"))
    // the replay: merged must NOT be recomputed (it would see the
    // half-merged state and double-count part=0 to n=3)
    var recomputed = false
    Streaming.mergeTouchedPartitions(spark, st, "part", 1L) {
      recomputed = true
      Seq((0, 3L), (1, 2L)).toDF("part", "n") // the WRONG recompute
    }
    assert(!recomputed)
    assert(spark.read.parquet(st).select("part", "n")
      .as[(Int, Long)].collect().toSet === Set((0, 2L), (1, 2L)))
    // marker committed, staging cleaned
    assert(fs.exists(p(s"$st/_graft_commits/1")) && !fs.exists(p(tmp)))
    // and a stranded staging dir of a COMMITTED prior batch is dropped
    // at the next batch's entry instead of leaking forever
    Seq((9, 9L)).toDF("part", "n")
      .write.mode("overwrite").partitionBy("part").parquet(tmp)
    Streaming.mergeTouchedPartitions(spark, st, "part", 2L) {
      Seq((0, 5L), (1, 5L)).toDF("part", "n")
    }
    assert(!fs.exists(p(tmp)))
    assert(spark.read.parquet(st).select("part", "n")
      .as[(Int, Long)].collect().toSet === Set((0, 5L), (1, 5L)))
  }

  test("incrementalAggBatch: a NULL partition value accumulates across " +
       "batches like any other (isin alone would silently reset the " +
       "null group to each batch's own contribution)") {
    val st = Files.createTempDirectory("graft-iagg-null").toString + "/state"
    def batchDf(v: Double) = Seq(
        (Option.empty[String], "click", v),
        (Some("2024-01-01"), "click", v))
      .toDF("day", "event_type", "value")
    Streaming.incrementalAggBatch(batchDf(1.0), st, "day",
                                  Seq("event_type"), "value", 0, 0L)
    Streaming.incrementalAggBatch(batchDf(2.0), st, "day",
                                  Seq("event_type"), "value", 0, 1L)
    val out = spark.read.parquet(st)
      .select(col("day"), col("n"), col("sum_value"))
      .as[(Option[String], Long, Double)].collect().toSet
    assert(out === Set((None, 2L, 3.0), (Some("2024-01-01"), 2L, 3.0)))
  }

  test("incremental agg compaction carries the replay markers across " +
       "the swap: a replayed batch after compaction is still a no-op") {
    val st = Files.createTempDirectory("graft-iagg-cm").toString + "/state"
    def batchDf(v: Double) = Seq(("2024-01-01", "click", v))
      .toDF("day", "event_type", "value")
    // compactEvery=2 -> compaction fires right after batch 1 commits
    Streaming.incrementalAggBatch(batchDf(1.0), st, "day",
                                  Seq("event_type"), "value", 2, 0L)
    Streaming.incrementalAggBatch(batchDf(2.0), st, "day",
                                  Seq("event_type"), "value", 2, 1L)
    val fs = new org.apache.hadoop.fs.Path(st)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the swap must have carried the markers — without that, this
    // replay would re-merge batch 1 and double-count
    assert(fs.exists(
      new org.apache.hadoop.fs.Path(s"$st/_graft_commits/1")))
    Streaming.incrementalAggBatch(batchDf(2.0), st, "day",
                                  Seq("event_type"), "value", 2, 1L)
    val out = spark.read.parquet(st).select("n", "sum_value")
      .as[(Long, Double)].collect().toSeq
    assert(out === Seq((2L, 3.0)))
  }

  test("incrementalAggBatch: replay into a compaction crash window " +
       "(store stranded under .compact.tmp, markers inside) promotes " +
       "first and is a NO-OP — checking the marker before recovery " +
       "would double-merge") {
    val st = Files.createTempDirectory("graft-iagg-cw").toString + "/state"
    def batchDf(v: Double) = Seq(("2024-01-01", "click", v))
      .toDF("day", "event_type", "value")
    // compactEvery=2: compaction runs right after batch 1's marker
    Streaming.incrementalAggBatch(batchDf(1.0), st, "day",
                                  Seq("event_type"), "value", 2, 0L)
    Streaming.incrementalAggBatch(batchDf(2.0), st, "day",
                                  Seq("event_type"), "value", 2, 1L)
    val fs = new org.apache.hadoop.fs.Path(st)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate the compaction swap dying between delete and rename:
    // the whole store (batch-1 marker included) exists ONLY as the tmp
    fs.rename(new org.apache.hadoop.fs.Path(st),
              new org.apache.hadoop.fs.Path(
                st + Sources.CompactTmpSuffix))
    // foreachBatch never returned -> streaming replays batch 1
    Streaming.incrementalAggBatch(batchDf(2.0), st, "day",
                                  Seq("event_type"), "value", 2, 1L)
    val out = spark.read.parquet(st).select("n", "sum_value")
      .as[(Long, Double)].collect().toSeq
    assert(out === Seq((2L, 3.0))) // NOT (3, 5.0): no double merge
  }

  test("incremental distinct sink: cross-batch duplicates never double-" +
       "count, untouched partitions survive, estimate == one-shot sketch") {
    implicit val sqlCtx = spark.sqlContext
    val state = Files.createTempDirectory("graft-hllsink").toString + "/state"
    val ckpt = Files.createTempDirectory("graft-hllsink-ckpt").toString
    val stream = MemoryStream[(Long, Timestamp, String, Double)]
    val withDay = Streaming.mvTransform(toDfStream(stream), Seq.empty)
      .withColumn("day", to_date(col("ts")))
    val q = Streaming.incrementalDistinctSink(withDay, state, ckpt,
      "day", Seq("event_type"), "user_id").start()
    // user 1 clicks on day 1 in BOTH batches (the cross-batch duplicate)
    stream.addData(Seq(
      (1L, ts("2024-01-01 01:00:00"), "click", 1.0),
      (2L, ts("2024-01-01 02:00:00"), "click", 1.0),
      (3L, ts("2024-01-02 01:00:00"), "view", 1.0)))
    q.processAllAvailable()
    def dayFiles(d: String): Set[String] = {
      val dir = new java.io.File(s"$state/day=$d")
      if (!dir.exists()) Set.empty
      else dir.listFiles().map(_.getName).filter(_.startsWith("part-")).toSet
    }
    val day2Before = dayFiles("2024-01-02")
    stream.addData(Seq(
      (1L, ts("2024-01-01 03:00:00"), "click", 1.0), // dup visitor
      (4L, ts("2024-01-01 04:00:00"), "click", 1.0))) // new visitor
    q.processAllAvailable()
    q.stop()
    // batch 2 touched only day 1 — day 2's sketch partition untouched
    assert(dayFiles("2024-01-02") === day2Before)
    val got = Streaming.distinctEstimates(spark, state)
      .select(col("day").cast("string"), col("event_type"),
              col("approx_distinct"))
      .as[(String, String, Long)].collect().sortBy(r => (r._1, r._2))
    // merged-sketch estimates must equal the one-shot sketch over the
    // union of both batches (mergeability), which at this size is exact
    assert(got === Array(("2024-01-01", "click", 3L),
                         ("2024-01-02", "view", 1L)))
  }

  test("incremental top-k sink: counts accumulate across batches, only " +
       "touched partitions rewritten, estimates exact in-regime") {
    implicit val sqlCtx = spark.sqlContext
    val state = Files.createTempDirectory("graft-topksink").toString + "/state"
    val ckpt = Files.createTempDirectory("graft-topksink-ckpt").toString
    val stream = MemoryStream[(Long, Timestamp, String, Double)]
    val withDay = Streaming.mvTransform(toDfStream(stream), Seq.empty)
      .withColumn("day", to_date(col("ts")))
    val q = Streaming.incrementalTopKSink(withDay, state, ckpt,
      "day", Seq.empty, "event_type", 64).start()
    stream.addData(Seq(
      (1L, ts("2024-01-01 01:00:00"), "click", 1.0),
      (2L, ts("2024-01-01 02:00:00"), "click", 1.0),
      (3L, ts("2024-01-02 01:00:00"), "view", 1.0)))
    q.processAllAvailable()
    def dayFiles(d: String): Set[String] = {
      val dir = new java.io.File(s"$state/day=$d")
      if (!dir.exists()) Set.empty
      else dir.listFiles().map(_.getName).filter(_.startsWith("part-")).toSet
    }
    val day2Before = dayFiles("2024-01-02")
    stream.addData(Seq(
      (4L, ts("2024-01-01 03:00:00"), "click", 1.0), // click total → 3
      (5L, ts("2024-01-01 04:00:00"), "view", 1.0))) // new item on day 1
    q.processAllAvailable()
    q.stop()
    // batch 2 touched only day 1 — day 2's sketch partition untouched
    assert(dayFiles("2024-01-02") === day2Before)
    val got = Streaming.topKEstimates(spark, state, 10)
      .select(col("day").cast("string"), col("item"), col("approx_count"))
      .as[(String, String, Long)].collect().sortBy(r => (r._1, r._2))
    // combined per-batch sketches must carry the cross-batch totals —
    // exact here because tracked budget (64) dwarfs the item domain
    assert(got === Array(("2024-01-01", "click", 3L),
                         ("2024-01-01", "view", 1L),
                         ("2024-01-02", "view", 1L)))
  }

  test("incremental distinct sink compaction collapses every state " +
       "partition to one file without changing estimates") {
    implicit val sqlCtx = spark.sqlContext
    // AQE's partition coalescing hides the small-file problem at test
    // size (it folds the tiny merge shuffle to one task → one file);
    // disable it HERE so the fixture shows the real at-scale shape —
    // several merge tasks each writing into the same hive partition
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prevCoalesce = spark.conf.get(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try {
    val state = Files.createTempDirectory("graft-hllc").toString + "/state"
    val ckpt = Files.createTempDirectory("graft-hllc-ckpt").toString
    val stream = MemoryStream[(Long, Timestamp, String, Double)]
    val withDay = Streaming.mvTransform(toDfStream(stream), Seq.empty)
      .withColumn("day", to_date(col("ts")))
    val q = Streaming.incrementalDistinctSink(withDay, state, ckpt,
      "day", Seq("event_type"), "user_id", compactEvery = 2).start()
    // 8 event types on day 1 → the merge shuffle scatters the partition
    // over several tasks, so the partition holds several part files
    stream.addData((1 to 8).map(i =>
      (i.toLong, ts(f"2024-01-01 ${i % 8}%02d:00:00"), s"t$i", 1.0)))
    q.processAllAvailable()
    def dayFileCount(d: String): Int = {
      val dir = new java.io.File(s"$state/day=$d")
      if (!dir.exists()) 0
      else dir.listFiles().count(_.getName.startsWith("part-"))
    }
    val before = dayFileCount("2024-01-01")
    val estBefore = Streaming.distinctEstimates(spark, state)
      .select(col("event_type"), col("approx_distinct"))
      .as[(String, Long)].collect().sortBy(_._1)
    // batch 2 ((1+1) % compactEvery == 0) triggers the compaction
    stream.addData(Seq((9L, ts("2024-01-01 09:00:00"), "t1", 1.0)))
    q.processAllAvailable()
    q.stop()
    assert(before > 1, s"fixture should scatter day 1 over >1 file, got $before")
    assert(dayFileCount("2024-01-01") === 1)
    // estimates survive the rewrite: t1 gained its second distinct user,
    // everything else identical
    val estAfter = Streaming.distinctEstimates(spark, state)
      .select(col("event_type"), col("approx_distinct"))
      .as[(String, Long)].collect().sortBy(_._1).toMap
    estBefore.foreach { case (t, n) =>
      assert(estAfter(t) === (if (t == "t1") n + 1 else n), t)
    }
    } finally spark.conf.set(coalesceKey, prevCoalesce)
  }

  test("incremental EMA sink composes batches into the one-shot EMA and " +
       "rewrites only touched buckets") {
    implicit val sqlCtx = spark.sqlContext
    val state = Files.createTempDirectory("graft-ema").toString + "/state"
    val ckpt = Files.createTempDirectory("graft-ema-ckpt").toString
    // pick a second user hashed into a DIFFERENT bucket than user 1
    def bucket(u: Long): Int = spark.range(1)
      .select(pmod(xxhash64(lit(u)), lit(4)).cast("int")).head.getInt(0)
    val u2 = (2L to 20L).find(bucket(_) != bucket(1L)).get
    val stream = MemoryStream[(Long, Timestamp, String, Double)]
    val q = Streaming.incrementalEmaSink(toDfStream(stream), state, ckpt,
      "user_id", "ts", "event_type", "value", 0.25, numBuckets = 4).start()
    val b1 = Seq(
      (1L, ts("2024-01-01 00:00:00"), "e1", 10.0),
      (1L, ts("2024-01-01 01:00:00"), "e2", 20.0),
      (u2, ts("2024-01-01 00:30:00"), "e3", 7.0))
    stream.addData(b1.map(r => (r._1, r._2, r._3, r._4)))
    q.processAllAvailable()
    def bucketFiles(b: Int): Set[String] = {
      val dir = new java.io.File(s"$state/__bucket=$b")
      if (!dir.exists()) Set.empty
      else dir.listFiles().map(_.getName).filter(_.startsWith("part-")).toSet
    }
    val u2FilesBefore = bucketFiles(bucket(u2))
    // batch 2: only user 1, strictly later events
    val b2 = Seq(
      (1L, ts("2024-01-01 02:00:00"), "e4", 40.0),
      (1L, ts("2024-01-01 03:00:00"), "e5", 8.0))
    stream.addData(b2.map(r => (r._1, r._2, r._3, r._4)))
    q.processAllAvailable()
    q.stop()
    // untouched entity's bucket partition survives byte-identical
    assert(bucketFiles(bucket(u2)) === u2FilesBefore)
    val got = Streaming.readEmaState(spark, state)
      .as[(Long, Double)].collect().toMap
    // composed result == the straight seeded fold over ALL events
    def fold(vs: Seq[Double]) =
      vs.tail.foldLeft(vs.head)((acc, v) => 0.25 * v + 0.75 * acc)
    val expect1 = fold(Seq(10.0, 20.0, 40.0, 8.0))
    assert(math.abs(got(1L) - expect1) < 1e-9, s"${got(1L)} vs $expect1")
    assert(got(u2) === 7.0)
  }

  test("projectionBatch replay after a crash before the commit marker " +
       "neither double-appends base rows nor double-merges partials") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-pbr").toString
    val base = root + "/base"
    val proj = root + "/proj"
    val b0 = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("k", "v")
    Streaming.projectionBatch(b0, base, proj, Seq("k"), Seq("v"), 0L)
    val baseRows = spark.read.parquet(base).count()
    def projState() = spark.read.parquet(proj)
      .select("k", "cnt", "sum_v").as[(String, Long, Long)]
      .collect().toSet
    val stateBefore = projState()
    assert(stateBefore === Set(("a", 2L, 3L), ("b", 1L, 3L)))
    // simulate the crash window: everything ran EXCEPT the marker —
    // streaming re-delivers the same batch id on restart
    val marker = new java.io.File(s"$base/_graft_commits/0")
    assert(marker.exists)
    marker.delete()
    Streaming.projectionBatch(b0, base, proj, Seq("k"), Seq("v"), 0L)
    // idempotent base append: the replay overwrote its own batch0-*
    // files instead of appending fresh UUID parts
    assert(spark.read.parquet(base).count() === baseRows)
    // the _merged_0 tag rode the swap: partials did NOT fold in twice
    assert(projState() === stateBefore)
    // a genuinely new batch still flows
    Streaming.projectionBatch(Seq(("b", 5L)).toDF("k", "v"),
                              base, proj, Seq("k"), Seq("v"), 1L)
    assert(projState() === Set(("a", 2L, 3L), ("b", 2L, 8L)))
    assert(spark.read.parquet(base).count() === baseRows + 1)
  }

  test("replay guard: a batch id already marked committed is skipped; " +
       "later batches process normally") {
    implicit val sqlCtx = spark.sqlContext
    val state = Files.createTempDirectory("graft-replay").toString + "/state"
    val ckpt = Files.createTempDirectory("graft-replay-ckpt").toString
    // simulate the post-crash re-delivery: batch 0 already committed
    Streaming.markCommitted(spark, state, 0L)
    assert(Streaming.alreadyCommitted(spark, state, 0L))
    assert(!Streaming.alreadyCommitted(spark, state, 1L))
    val stream = MemoryStream[(Long, Timestamp, String, Double)]
    val withDay = Streaming.mvTransform(toDfStream(stream), Seq.empty)
      .withColumn("day", to_date(col("ts")))
    val q = Streaming.incrementalAggSink(withDay, state, ckpt,
      "day", Seq("event_type"), "value").start()
    stream.addData(Seq((1L, ts("2024-01-01 01:00:00"), "click", 1.0)))
    q.processAllAvailable() // batch 0: replayed → must be a no-op
    stream.addData(Seq((2L, ts("2024-01-01 02:00:00"), "click", 2.0)))
    q.processAllAvailable() // batch 1: fresh → must commit
    q.stop()
    val out = spark.read.parquet(state)
      .select("event_type", "n", "sum_value")
      .as[(String, Long, Double)].collect()
    // only batch 1's row counted — the replayed batch didn't double in
    assert(out === Array(("click", 1L, 2.0)))
    assert(Streaming.alreadyCommitted(spark, state, 1L))
  }

  test("T6: watermark drops events later than the allowed lateness") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String, Double)]
    val agg = Streaming.watermarkedTumblingCounts(
      toDfStream(stream), "ts", "10 minutes", "10 minutes")
    val q = agg.writeStream.format("memory").queryName("late")
      .outputMode("append").start()
    // batch 1: one event in the 00:00 window + one far ahead that advances
    // the watermark to 02:50, finalizing the 00:00 window
    stream.addData(Seq((1L, ts("2024-01-01 00:01:00"), "click", 1.0),
                       (1L, ts("2024-01-01 03:00:00"), "click", 1.0)))
    q.processAllAvailable()
    // batch 2: a late arrival for the already-finalized 00:00 window
    stream.addData(Seq((1L, ts("2024-01-01 00:02:00"), "click", 9.0)))
    q.processAllAvailable()
    stream.addData(Seq((1L, ts("2024-01-01 05:00:00"), "click", 1.0)))
    q.processAllAvailable()
    q.stop()
    val counts = spark.table("late")
      .select(col("w_start").cast("string"), col("n"))
      .as[(String, Long)].collect().toMap
    assert(counts("2024-01-01 00:00:00") === 1L) // late event was dropped
  }

  test("T5: session windows split on 30-minute gaps") {
    val rows = Seq(
      (1L, ts("2024-01-01 00:00:00"), "a", 1.0),
      (1L, ts("2024-01-01 00:10:00"), "a", 1.0),
      (1L, ts("2024-01-01 01:00:00"), "a", 1.0) // 50-min gap → new session
    )
    val out = Streaming.sessionStats(toDf(rows), col("ts"), "30 minutes")
      .orderBy("s_start").select("s_start", "n")
      .as[(Timestamp, Long)].collect()
    assert(out === Array((ts("2024-01-01 00:00:00"), 2L),
                         (ts("2024-01-01 01:00:00"), 1L)))
  }

  test("stream-stream interval join matches the batch interval join") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = Seq((1L, ts("2024-01-01 00:00:00"), "click", 0.0),
                     (1L, ts("2024-01-01 01:00:00"), "click", 0.0))
    val buys = Seq((1L, ts("2024-01-01 00:05:00"), "purchase", 5.0),
                   (1L, ts("2024-01-01 02:30:00"), "purchase", 7.0))
    val ls = MemoryStream[(Long, Timestamp, String, Double)]
    val rs = MemoryStream[(Long, Timestamp, String, Double)]
    ls.addData(buys)
    rs.addData(clicks)
    val lDf = toDfStream(ls).withWatermark("ts", "1 hour")
    val rDf = toDfStream(rs).withColumnRenamed("ts", "r_ts")
      .withColumnRenamed("event_type", "r_type")
      .withColumnRenamed("value", "r_value")
      .withWatermark("r_ts", "1 hour")
    val joined = Streaming.intervalJoin(lDf, rDf, "user_id", "ts", "r_ts",
                                        "10 MINUTES", "0 SECONDS")
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ssjoin")
      .select(col("value"), col("r_ts").cast("string"))
      .as[(Double, String)].collect().toSet
    // only the 00:05 purchase has a click within its trailing 10 minutes
    assert(streamed === Set((5.0, "2024-01-01 00:00:00")))
    // batch parity
    val batch = Streaming.intervalJoin(
      toDf(buys), toDf(clicks).withColumnRenamed("ts", "r_ts"),
      "user_id", "ts", "r_ts", "10 MINUTES", "0 SECONDS")
    assert(batch.count() === 1)
  }

  test("mvTransform applies the reference MV's micros conversion") {
    val out = Streaming.mvTransform(
      Seq((1L, 1999999L)).toDF("id", "updated_at"), Seq("updated_at"))
      .select(col("updated_at").cast("long")).as[Long].head()
    assert(out === 1L) // truncated, not rounded (README.md:226-227)
  }

  test("substrCoverageSink: streaming batches equal the incremental run; " +
       "replay is duplicate-only; compaction changes nothing") {
    def docs = Tables(spark, sf("documents"), "documents")
    val batch1 = docs.filter(col("doc_id") < 250)
    val batch2 = docs.filter(col("doc_id") >= 250)
    def covRows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_dup_spans", "dup_cover_chars")
        .as[(Long, Long, Long)].collect().toSet
    // reference: the batch incremental op over the same two batches
    val refStore = Files.createTempDirectory("graft-scs").toString + "/s"
    val r1 = LlmOps.exactSubstrIncremental(batch1, "doc_id", "text",
                                           refStore, 40)
      .withColumnRenamed("doc", "doc_id")
    val r2 = LlmOps.exactSubstrIncremental(batch2, "doc_id", "text",
                                           refStore, 40)
      .withColumnRenamed("doc", "doc_id")
    val expected = covRows(r1) ++ covRows(r2)
    // streaming sink, driven batch-at-a-time through the package-private
    // batch function
    val base = Files.createTempDirectory("graft-scs2").toString
    val out = base + "/out"
    val store = base + "/store"
    Streaming.substrCoverageBatch(batch1, "doc_id", "text", out, store,
                                  40, 1, 16, 0, 0L)
    Streaming.substrCoverageBatch(batch2, "doc_id", "text", out, store,
                                  40, 1, 16, 0, 1L)
    assert(covRows(spark.read.parquet(out)) === expected)
    // crash-window replay of batch 1 (marker cleared): output rows may
    // duplicate (at-least-once) but the distinct set must not change —
    // the own-partition exclusion keeps the history it scores against
    // identical even though its store partition already exists
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$out/_graft_commits/1"),
              false)
    Streaming.substrCoverageBatch(batch2, "doc_id", "text", out, store,
                                  40, 1, 16, 0, 1L)
    assert(covRows(spark.read.parquet(out)) === expected)
    // store totals = full-corpus window count, batch partitions intact
    val totalWindows = docs
      .selectExpr("sum(greatest(length(text) - 39, 0)) AS n")
      .as[Long].head()
    assert(spark.read.parquet(store).selectExpr("sum(n)").as[Long].head()
             === totalWindows)
    // compacting run (every 2nd batch): same rows, store consolidated
    val cbase = Files.createTempDirectory("graft-scs3").toString
    Streaming.substrCoverageBatch(batch1, "doc_id", "text", cbase + "/o",
                                  cbase + "/s", 40, 1, 16, 2, 0L)
    Streaming.substrCoverageBatch(batch2, "doc_id", "text", cbase + "/o",
                                  cbase + "/s", 40, 1, 16, 2, 2L)
    assert(covRows(spark.read.parquet(cbase + "/o")) === expected)
    assert(spark.read.parquet(cbase + "/s")
             .selectExpr("sum(n)").as[Long].head() === totalWindows)
    // batch 2 ran the compaction first: history consolidated to batch=-1
    assert(spark.read.parquet(cbase + "/s")
             .select("batch").distinct().as[Int].collect().toSet
             === Set(-1, 2))
  }

  test("zscoreAlertSink: incremental flags equal the one-shot run; " +
       "replay is duplicate-only; compaction bounds the store") {
    def t(i: Int) = new Timestamp(1700000000000L + i * 1000L)
    // series 1: 40 near-steady values, a 10x spike at tie 40, steady
    // after; series 2: constant (variance 0 — predicate must stay exact)
    val rows = (0 until 40).map(i =>
        (1L, t(i), i.toLong, if (i % 2 == 0) 100L else 101L)) ++
      Seq((1L, t(40), 40L, 1000L), (1L, t(41), 41L, 100L)) ++
      (0 until 35).map(i => (2L, t(i), (100 + i).toLong, 7L))
    val df = rows.toDF("k", "ts", "tie", "v")
    def flagSet(d: org.apache.spark.sql.DataFrame) =
      d.select("k", "tie", "checked", "anomaly")
        .as[(Long, Long, Boolean, Boolean)].collect().toSet
    val oneShot = flagSet(
      Analytics.rollingZscoreFlags(df, "k", "ts", "tie", "v"))
    assert(oneShot.count(_._4) === 1) // exactly the planted spike
    // time-split batches (ordered arrival per key, spike's trailing
    // window spans the batch boundary)
    val b1 = df.filter(col("ts") < lit(t(30)))
    val b2 = df.filter(col("ts") >= lit(t(30)))
    val base = Files.createTempDirectory("graft-zs").toString
    Streaming.zscoreAlertBatch(b1, base + "/o", base + "/s", "k", "ts",
                               "tie", "v", 100, 30, 3, 16, 0, 0L)
    Streaming.zscoreAlertBatch(b2, base + "/o", base + "/s", "k", "ts",
                               "tie", "v", 100, 30, 3, 16, 0, 1L)
    assert(flagSet(spark.read.parquet(base + "/o")) === oneShot)
    // crash-window replay of batch 2 (marker cleared): rows may
    // duplicate (at-least-once) but the distinct set must not change —
    // own-partition exclusion keeps the scoring history identical
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(
      new org.apache.hadoop.fs.Path(s"$base/o/_graft_commits/1"), false)
    Streaming.zscoreAlertBatch(b2, base + "/o", base + "/s", "k", "ts",
                               "tie", "v", 100, 30, 3, 16, 0, 1L)
    assert(flagSet(spark.read.parquet(base + "/o")) === oneShot)
    // compacting run with a tight lookback: the fold keeps each key's
    // latest 10 rows only, and the output still equals the one-shot run
    // at the same (lookback, minN)
    val oneShot10 = flagSet(
      Analytics.rollingZscoreFlags(df, "k", "ts", "tie", "v", 10, 5))
    val cb = Files.createTempDirectory("graft-zs2").toString
    Streaming.zscoreAlertBatch(b1, cb + "/o", cb + "/s", "k", "ts",
                               "tie", "v", 10, 5, 3, 16, 2, 0L)
    Streaming.zscoreAlertBatch(b2, cb + "/o", cb + "/s", "k", "ts",
                               "tie", "v", 10, 5, 3, 16, 2, 2L)
    assert(flagSet(spark.read.parquet(cb + "/o")) === oneShot10)
    val folded = spark.read.parquet(cb + "/s")
      .filter(col("batch") === -1).groupBy("k").count()
      .as[(Long, Long)].collect().toMap
    assert(folded.nonEmpty && folded.values.forall(_ <= 10))
  }

  test("kmeansBatch: mini-batch centroids track two planted blobs " +
       "across batches, replay is a no-op, serving classifies a fresh " +
       "vector into the right cluster") {
    def mkVecs(ids: Range): org.apache.spark.sql.DataFrame =
      spark.createDataFrame(ids.map { kk =>
        val sgn = if (kk % 2 == 0) 1.0 else -1.0
        (kk.toLong, Array.tabulate(64)(i =>
          (if (i < 4) sgn * 0.5 + ((kk * 13 + i) % 5 - 2) * 0.002
           else 0.0).toFloat))
      }).toDF("vec_id", "embedding")
    val st = Files.createTempDirectory("graft-mbk").toString
    Streaming.kmeansBatch(mkVecs(0 until 40), st, 2, 0L)
    Streaming.kmeansBatch(mkVecs(40 until 90), st, 2, 1L)
    val cents = spark.read.parquet(s"$st/centroids")
      .select("cid", "i", "c", "n")
      .as[(Long, Long, Long, Long)].collect()
    // every cluster row carries the full corpus count split 45/45
    assert(cents.map(_._4).distinct.sorted.toSeq === Seq(45L))
    // on dims 1-4 the two centroids sit near +-5000 (e4 grid of +-0.5)
    val byCluster = cents.filter(_._2 <= 4).groupBy(_._1)
      .map { case (cid, rows) => cid -> rows.map(_._3.toDouble).sum / 4 }
    assert(byCluster.size === 2)
    assert(byCluster.values.exists(_ > 4000) &&
           byCluster.values.exists(_ < -4000), s"centroids: $byCluster")
    // replay with marker cleared but tag present: state unchanged
    val before = cents.toSet
    val fs = new org.apache.hadoop.fs.Path(st)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$st/_graft_commits/1"),
              false)
    Streaming.kmeansBatch(mkVecs(40 until 90), st, 2, 1L)
    assert(spark.read.parquet(s"$st/centroids")
      .select("cid", "i", "c", "n")
      .as[(Long, Long, Long, Long)].collect().toSet === before)
    // serving: fresh probes land in the expected opposite clusters
    val probes = spark.createDataFrame(Seq(
      (1000L, Array.tabulate(64)(i => if (i < 4) 0.5f else 0f)),
      (1001L, Array.tabulate(64)(i => if (i < 4) -0.5f else 0f))))
      .toDF("vec_id", "embedding")
    val got = Streaming.assignWithCentroidState(probes, spark, st)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    assert(got(1000L) != got(1001L))
    // crash window between the state swap's delete and rename: serving
    // reads the stranded complete tmp instead of failing
    fs.rename(new org.apache.hadoop.fs.Path(s"$st/centroids"),
              new org.apache.hadoop.fs.Path(s"$st/centroids.tmp"))
    val gotTmp = Streaming.assignWithCentroidState(probes, spark, st)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    assert(gotTmp === got)
  }

  test("kmeansBatch: an empty or <k first batch does NOT seed — its " +
       "vectors stash in a pending dir and fold into the first " +
       "adequate batch's seed, so no pre-seed vector is lost") {
    def mkVecs(ids: Range): org.apache.spark.sql.DataFrame =
      spark.createDataFrame(ids.map { kk =>
        val sgn = if (kk % 2 == 0) 1.0 else -1.0
        (kk.toLong, Array.tabulate(64)(i =>
          (if (i < 4) sgn * 0.5 + ((kk * 13 + i) % 5 - 2) * 0.002
           else 0.0).toFloat))
      }).toDF("vec_id", "embedding")
    val st = Files.createTempDirectory("graft-mbk0").toString
    val fs = new org.apache.hadoop.fs.Path(st)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    // empty startup micro-batch: seeding from it would lock in a 0-row
    // store forever — it must commit (replay-safe) WITHOUT writing one
    Streaming.kmeansBatch(mkVecs(0 until 0), st, 2, 0L)
    assert(fs.exists(p(s"$st/_graft_commits/0")))
    assert(!fs.exists(p(s"$st/centroids")))
    // a 1-distinct-vector batch (< k = 2) must not seed either — but
    // its vector STASHES instead of vanishing
    Streaming.kmeansBatch(mkVecs(0 until 1), st, 2, 1L)
    assert(fs.exists(p(s"$st/_graft_commits/1")))
    assert(!fs.exists(p(s"$st/centroids")))
    assert(fs.exists(p(s"$st/pending/batch=1")))
    // the first ADEQUATE batch seeds the full k clusters AND folds the
    // stashed vector into the statistics: 40 batch vectors + 1 pending
    // observation = 41 per dimension, and the stash is cleared
    Streaming.kmeansBatch(mkVecs(40 until 80), st, 2, 2L)
    val cents = spark.read.parquet(s"$st/centroids")
      .select("cid", "i", "n").as[(Long, Long, Long)].collect()
    assert(cents.map(_._1).distinct.toSet === Set(0L, 1L))
    assert(cents.filter(_._2 == 1L).map(_._3).sum === 41L)
    assert(!fs.exists(p(s"$st/pending")))
  }

  test("invertedIndexSink: the streaming-built index serves BM25 " +
       "bit-identical to the one-shot batch scorer; replay is a " +
       "no-op; an empty batch leaves no state") {
    val docs = Tables(spark, sf("documents"), "documents")
      .select("doc_id", "text")
    val st = Files.createTempDirectory("graft-invidx").toString
    val fs = new org.apache.hadoop.fs.Path(st)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // empty startup batch: committed, but no parquet-less store seeded
    Streaming.invertedIndexBatch(docs.filter(lit(false)), "doc_id",
                                 "text", st, 16, 0, 0L)
    assert(fs.exists(
      new org.apache.hadoop.fs.Path(s"$st/_graft_commits/0")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$st/postings")))
    // two real batches build the standing index incrementally
    Streaming.invertedIndexBatch(docs.filter(col("doc_id") < 250),
                                 "doc_id", "text", st, 16, 0, 1L)
    Streaming.invertedIndexBatch(docs.filter(col("doc_id") >= 250),
                                 "doc_id", "text", st, 16, 0, 2L)
    val terms = Seq("data", "query", "the")
    def served() = Streaming.bm25FromIndexState(spark, st, terms)
      .select(col("doc").as("id"), col("bm25_e6"), col("n_terms"))
      .as[(Long, Long, Long)].collect().toSet
    val oneShot = LlmOps.bm25Scores(docs, "doc_id", "text", terms)
      .select(col("doc_id").as("id"), col("bm25_e6"), col("n_terms"))
      .as[(Long, Long, Long)].collect().toSet
    assert(served() === oneShot && oneShot.nonEmpty)
    // crash-window re-delivery with the marker intact: full no-op
    Streaming.invertedIndexBatch(docs.filter(col("doc_id") >= 250),
                                 "doc_id", "text", st, 16, 0, 2L)
    assert(served() === oneShot)
    // crash BETWEEN the postings write and the marker: replay with the
    // marker CLEARED must also be a no-op — both legs are idempotent
    // per-batch partition overwrites, so tf/df/n_docs can never inflate
    // (a plain append here would double batch 2's postings and stats)
    fs.delete(new org.apache.hadoop.fs.Path(s"$st/_graft_commits/2"),
              false)
    Streaming.invertedIndexBatch(docs.filter(col("doc_id") >= 250),
                                 "doc_id", "text", st, 16, 0, 2L)
    assert(served() === oneShot)
  }

  test("invertedIndexBatch: compaction folds prior batches into one " +
       "batch=-1 history partition through a tmp swap; serving and a " +
       "half-finished swap recovery are unchanged") {
    val docs = Tables(spark, sf("documents"), "documents")
      .select("doc_id", "text")
    val st = Files.createTempDirectory("graft-invidx-c").toString
    val fs = new org.apache.hadoop.fs.Path(st)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Streaming.invertedIndexBatch(docs.filter(col("doc_id") < 150),
                                 "doc_id", "text", st, 16, 2, 0L)
    Streaming.invertedIndexBatch(
      docs.filter(col("doc_id") >= 150 && col("doc_id") < 300),
      "doc_id", "text", st, 16, 2, 1L)
    // batch 2 compacts batches 0+1 into batch=-1 at its start, then
    // writes its own partition
    Streaming.invertedIndexBatch(docs.filter(col("doc_id") >= 300),
                                 "doc_id", "text", st, 16, 2, 2L)
    val parts = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$st/postings"))
      .map(_.getPath.getName).filter(_.startsWith("batch=")).toSet
    assert(parts === Set("batch=-1", "batch=2"))
    val terms = Seq("data", "query", "the")
    def served() = Streaming.bm25FromIndexState(spark, st, terms)
      .select(col("doc").as("id"), col("bm25_e6"), col("n_terms"))
      .as[(Long, Long, Long)].collect().toSet
    val oneShot = LlmOps.bm25Scores(docs, "doc_id", "text", terms)
      .select(col("doc_id").as("id"), col("bm25_e6"), col("n_terms"))
      .as[(Long, Long, Long)].collect().toSet
    assert(served() === oneShot && oneShot.nonEmpty)
    // a crash between the swap's delete and rename leaves only the
    // complete tmp — SERVING inside the crash window reads the tmp
    // (read-only fallback), and the next batch promotes it for real
    fs.rename(new org.apache.hadoop.fs.Path(s"$st/postings"),
              new org.apache.hadoop.fs.Path(s"$st/postings.tmp"))
    assert(served() === oneShot)
    Streaming.invertedIndexBatch(docs.filter(lit(false)), "doc_id",
                                 "text", st, 16, 2, 3L)
    assert(served() === oneShot)
  }

  test("scatterBatch: accumulated store == one-shot scatter of the " +
       "union, PCA from the store == batch PCA, replay is a no-op, " +
       "and a half-finished swap self-heals") {
    def mkVecs(ids: Range): org.apache.spark.sql.DataFrame =
      spark.createDataFrame(ids.map { k =>
        (k.toLong, Array.tabulate(64)(i =>
          (((k * 31 + i * 7) % 13) - 6) * 0.05f))
      }).toDF("vec_id", "embedding")
    val b1 = mkVecs(0 until 40)
    val b2 = mkVecs(40 until 90)
    val all = mkVecs(0 until 90)
    val st = Files.createTempDirectory("graft-scatter").toString
    Streaming.scatterBatch(b1, st, 0L)
    Streaming.scatterBatch(b2, st, 1L)
    def stateRows(dir: String) =
      spark.read.parquet(s"$dir/scatter")
        .select("kind", "i", "j", "v")
        .as[(String, Long, Long, Long)].collect().toSet
    val oneShot = LlmOps.scatterPartials(all)
      .select("kind", "i", "j", "v")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(stateRows(st) === oneShot)
    // serving: PCA over the store == PCA over the one-shot corpus
    def vecOf(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("dim").select("v").as[Long].collect().toSeq
    assert(vecOf(Streaming.pcaFromScatterState(spark, st, 4)) ===
           vecOf(LlmOps.pcaTopComponent(all, 64, 4)))
    // replay of batch 1 with the marker intact: full no-op
    Streaming.scatterBatch(b2, st, 1L)
    assert(stateRows(st) === oneShot)
    // marker cleared but _merged_ tag present (crash after swap,
    // before marker): the merge is skipped, partials not double-folded
    val fs = new org.apache.hadoop.fs.Path(st)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$st/_graft_commits/1"),
              false)
    Streaming.scatterBatch(b2, st, 1L)
    assert(stateRows(st) === oneShot)
    // crash between delete and rename: only the tmp copy exists — the
    // next batch promotes it before merging
    fs.rename(new org.apache.hadoop.fs.Path(s"$st/scatter"),
              new org.apache.hadoop.fs.Path(s"$st/scatter.tmp"))
    val b3 = mkVecs(90 until 100)
    Streaming.scatterBatch(b3, st, 2L)
    assert(stateRows(st) ===
      LlmOps.scatterPartials(mkVecs(0 until 100))
        .select("kind", "i", "j", "v")
        .as[(String, Long, Long, Long)].collect().toSet)
  }

  test("feedMemoryBatches: resendPrior duplicates prior rows into later " +
       "batches and a dedup sink suppresses every copy, no row lost") {
    implicit val sqlCtx = spark.sqlContext
    val rows = (0L until 90L).map(i => (i, s"doc-$i"))
    val dir = Files.createTempDirectory("graft-feed-resend").toString
    val stream = MemoryStream[(Long, String)]
    val q = Streaming.dedupAgainstHistorySink(
      stream.toDF().toDF("id", "text"), "text", s"$dir/out",
      s"$dir/store", s"$dir/ckpt", numBuckets = 4).start()
    Streaming.feedMemoryBatches(stream, rows, q, batches = 3,
                                resendPrior = 8)
    // resent duplicates were really fed (batches 2 and 3 carry prior
    // samples) yet the deduped output is exactly the distinct set
    val out = spark.read.parquet(s"$dir/out")
      .select("text").as[String].collect().toSeq
    assert(out.size === out.toSet.size) // no duplicate slipped
    assert(out.toSet === rows.map(_._2).toSet) // no row lost
    // the seen-store holds one hash per distinct text — each resent
    // sample matched existing store state instead of re-entering it
    val store = spark.read.parquet(s"$dir/store")
    assert(store.count() === rows.size.toLong)
  }
}
