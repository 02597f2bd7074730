package graft

import org.apache.spark.sql.functions._

/** Streaming operators under the cross-engine oracle (SURVEY.md §2.9).
  * T3/T4/T5/T6 EXECUTE as real multi-batch Structured Streaming runs
  * inside the key (file-source feed — [[feedFiles]] — with
  * out-of-order rows across batch seams, append-mode emission under a
  * watermark), hash-checked in DuckDB (time_bucket for tumbling/
  * sliding, gaps-and-islands for session windows). Additional
  * batch/stream parity is asserted in StreamingSpec with MemoryStream.
  */
object StreamingQueries extends QueryPack {

  /** The executed-window-key feed: the fixture's rows PSEUDO-SHUFFLED
    * (ordered by xxhash64 of a unique id) so every batch seam carries
    * out-of-order event times, split into `batches` micro-batches,
    * then one far-future flush sentinel. The watermark lateness covers
    * the fixture's whole time span, so the shuffle drops nothing; the
    * sentinel pushes the watermark past every real window so append
    * mode emits them, while its own window can never finalize (the
    * watermark trails its event time by the lateness) — structurally
    * excluded from the output, no post-filter that could push below
    * EventTimeWatermark. The driver-side collect is broker stand-in
    * scaffolding (bounded by the fixture), as in q_stream_upsert.
    */
  private def feedShuffled[T](
      stream: org.apache.spark.sql.execution.streaming.runtime.MemoryStream[T],
      rows: Array[T], sentinel: T,
      q: org.apache.spark.sql.streaming.StreamingQuery,
      batches: Int = 3): Unit = {
    val sliceLen = math.max(1, rows.length / batches + 1)
    var start = 0
    while (start < rows.length) {
      stream.addData(
        rows.slice(start, math.min(rows.length, start + sliceLen)).toSeq)
      q.processAllAvailable()
      start += sliceLen
    }
    stream.addData(Seq(sentinel))
    q.processAllAvailable()
    q.stop()
  }

  // fixture event times span 30 days; a 45-day lateness makes the
  // deliberately shuffled feed drop nothing, and sentinel = max + 46 d
  // puts the final watermark (sentinel − lateness = max + 1 d) past
  // every real window end without ever finalizing the sentinel's own
  private val WindowLateness = "45 days"
  private def sentinelTs(maxTs: java.sql.Timestamp): java.sql.Timestamp =
    java.sql.Timestamp.from(maxTs.toInstant.plusSeconds(46L * 24 * 3600))

  /** File-source feed for the executed window keys — the broker
    * stand-in WITHOUT driver-side data staging: each slice writes as
    * ONE parquet file into `feedDir` (executor write, executor read;
    * no collect anywhere on the data path). [[feedFiles]] starts from
    * an EMPTY feed dir and alternates write-one-file /
    * `processAllAvailable()`, so each slice is exactly one
    * micro-batch in exactly the given order BY CONSTRUCTION — no
    * reliance on the source's internal file ordering (mtime ties and
    * listing order are not a contract). Slice membership is
    * hash-assigned (`pmod(xxhash64(id), n)`), so every batch seam
    * still carries out-of-order event times into windows whose state
    * an earlier batch opened.
    */
  private def writeSliceFile(s: org.apache.spark.sql.SparkSession,
                             feedDir: String, i: Int,
                             df: org.apache.spark.sql.DataFrame): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(feedDir).getFileSystem(conf)
    fs.mkdirs(new org.apache.hadoop.fs.Path(feedDir))
    val stage = s"$feedDir/_stage_$i"
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(stage))
      .map(_.getPath).find(_.getName.startsWith("part-"))
      .getOrElse(throw new IllegalStateException(
        s"no part file staged in $stage"))
    val target =
      new org.apache.hadoop.fs.Path(feedDir, f"slice-$i%02d.parquet")
    if (!fs.rename(part, target))
      throw new java.io.IOException(s"rename $part -> $target failed")
    fs.delete(new org.apache.hadoop.fs.Path(stage), true)
  }

  /** Drive `q` through one micro-batch per slice: write slice i's file,
    * drain, repeat — then stop. The feed dir must start empty.
    */
  private def feedFiles(s: org.apache.spark.sql.SparkSession,
                        feedDir: String,
                        slices: Seq[org.apache.spark.sql.DataFrame],
                        q: org.apache.spark.sql.streaming.StreamingQuery)
      : Unit = {
    slices.zipWithIndex.foreach { case (df, i) =>
      writeSliceFile(s, feedDir, i, df)
      q.processAllAvailable()
    }
    q.stop()
  }

  val queries: Map[String, Q] = Map(
    // T3 EXECUTED: 10-minute tumbling counts per event type as a real
    // multi-batch streaming run — the seam-crossing out-of-order rows
    // land in windows whose state is already open from earlier batches,
    // so cross-batch window-state merge sits on the hash path. The feed
    // is the FILE source ([[feedFiles]]): hash-assigned slices written
    // as single parquet files, one per micro-batch by construction —
    // no driver-side data staging anywhere in the key (the only
    // collect is the 1-row max(ts) sentinel stat).
    "q_stream_tumbling" -> ((s, dir) => {
      val scratch = java.nio.file.Files
        .createTempDirectory("graft-stream-tumb").toString
      val src = Tables(s, dir, "events")
        .filter(col("ts").isNotNull)
        .select(col("ts"), col("event_type"),
                pmod(xxhash64(col("event_id")), lit(3)).as("slice"))
      val maxTs = src.agg(max("ts")).head().getTimestamp(0)
      val sentinel = s.sql(
        s"SELECT TIMESTAMP '${sentinelTs(maxTs)}' AS ts, " +
          "'__flush' AS event_type")
      new org.apache.hadoop.fs.Path(s"$scratch/feed")
        .getFileSystem(s.sparkContext.hadoopConfiguration)
        .mkdirs(new org.apache.hadoop.fs.Path(s"$scratch/feed"))
      val stream = s.readStream
        .schema("ts TIMESTAMP, event_type STRING")
        .parquet(s"$scratch/feed")
      val agg = Streaming.watermarkedTumblingCounts(
        stream, "ts", "10 minutes", WindowLateness)
      val q = Streaming.appendSink(agg, s"$scratch/out",
                                   s"$scratch/ckpt").start()
      feedFiles(s, s"$scratch/feed",
        (0 until 3).map(i => src.filter(col("slice") === i)
          .select("ts", "event_type")) :+ sentinel, q)
      s.read.parquet(s"$scratch/out")
        .select("w_start", "event_type", "n")
        .orderBy("w_start", "event_type")
    }),

    // T4 EXECUTED: 10-minute windows sliding by 5 (every event lands in
    // 2 windows) as a real streaming run, same file-source protocol as
    // T3.
    "q_stream_sliding" -> ((s, dir) => {
      val scratch = java.nio.file.Files
        .createTempDirectory("graft-stream-slide").toString
      val src = Tables(s, dir, "events")
        .filter(col("ts").isNotNull)
        .select(col("ts"),
                pmod(xxhash64(col("event_id")), lit(3)).as("slice"))
      val maxTs = src.agg(max("ts")).head().getTimestamp(0)
      val sentinel =
        s.sql(s"SELECT TIMESTAMP '${sentinelTs(maxTs)}' AS ts")
      new org.apache.hadoop.fs.Path(s"$scratch/feed")
        .getFileSystem(s.sparkContext.hadoopConfiguration)
        .mkdirs(new org.apache.hadoop.fs.Path(s"$scratch/feed"))
      val stream = s.readStream
        .schema("ts TIMESTAMP")
        .parquet(s"$scratch/feed")
      val agg = Streaming.watermarkedSlidingCounts(
        stream, "ts", "10 minutes", "5 minutes", WindowLateness)
      val q = Streaming.appendSink(agg, s"$scratch/out",
                                   s"$scratch/ckpt").start()
      feedFiles(s, s"$scratch/feed",
        (0 until 3).map(i => src.filter(col("slice") === i)
          .select("ts")) :+ sentinel, q)
      s.read.parquet(s"$scratch/out")
        .select("w_start", "n")
        .orderBy("w_start")
    }),

    // T5 EXECUTED: 30-minute-gap sessionization per user as a real
    // streaming run — session_window keeps per-(user, open-session)
    // STATE across micro-batches and must MERGE sessions when a
    // seam-crossing out-of-order row lands inside an open gap; the
    // summed value rides the floor-e4 integer grid so merge order can
    // never move the hash. Oracle = the gaps-and-islands SQL. Fed
    // through the file source like T3/T4 (no driver-side data
    // staging; the sentinel uses user_id −1, outside the fixture's key
    // space, and its session can never finalize under the watermark).
    "q_stream_session" -> ((s, dir) => {
      val scratch = java.nio.file.Files
        .createTempDirectory("graft-stream-sess").toString
      val src = Tables(s, dir, "events")
        .filter(col("ts").isNotNull)
        .select(col("user_id"), col("ts"),
                floor(col("value") * 10000).cast("long").as("value_e4"),
                pmod(xxhash64(col("event_id")), lit(3)).as("slice"))
      val maxTs = src.agg(max("ts")).head().getTimestamp(0)
      val sentinel = s.sql(
        s"SELECT CAST(-1 AS BIGINT) AS user_id, " +
          s"TIMESTAMP '${sentinelTs(maxTs)}' AS ts, " +
          "CAST(0 AS BIGINT) AS value_e4")
      new org.apache.hadoop.fs.Path(s"$scratch/feed")
        .getFileSystem(s.sparkContext.hadoopConfiguration)
        .mkdirs(new org.apache.hadoop.fs.Path(s"$scratch/feed"))
      val stream = s.readStream
        .schema("user_id BIGINT, ts TIMESTAMP, value_e4 BIGINT")
        .parquet(s"$scratch/feed")
      val agg = Streaming.watermarkedSessionStats(
        stream, "ts", "30 minutes", WindowLateness)
      val q = Streaming.appendSink(agg, s"$scratch/out",
                                   s"$scratch/ckpt").start()
      feedFiles(s, s"$scratch/feed",
        (0 until 3).map(i => src.filter(col("slice") === i)
          .select("user_id", "ts", "value_e4")) :+ sentinel, q)
      s.read.parquet(s"$scratch/out")
        .select("user_id", "s_start", "n", "sum_value_e4")
        .orderBy("user_id", "s_start")
    }),

    // T1/U1 END-TO-END UNDER THE ORACLE: the reference's continuous
    // loop (Kafka-engine table → MV → ReplacingMergeTree merge,
    // README.md:197-231,176) actually EXECUTED as a Structured
    // Streaming job inside the key — a MemoryStream source feeds the
    // events fixture in three micro-batches through
    // [[Streaming.upsertSink]]'s bucketed merge, and the returned
    // frame is the FINAL-state read, hash-checked against the plain
    // latest-per-key SQL (the same oracle as the batch
    // q_upsert_latest). The driver-side collect feeding MemoryStream
    // is harness scaffolding standing in for a broker, not operator
    // cost — the merge itself is the distributed bucketed upsert.
    // Fresh temp state/checkpoint per invocation keeps repeated
    // driver runs deterministic.
    "q_stream_upsert" -> ((s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
                col("event_type"), col("value"))
        .orderBy("event_id")
        .as[(Long, java.sql.Timestamp, Long, String, Double)]
        .collect()
      val scratch = java.nio.file.Files
        .createTempDirectory("graft-stream-upsert").toString
      val state = s"$scratch/state"
      val stream =
        MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
      val q = Streaming.upsertSink(
        stream.toDF().toDF("user_id", "ts", "event_id", "event_type",
                           "value"),
        state, s"$scratch/ckpt", Seq("user_id"),
        Seq("ts", "event_id")).start()
      Streaming.feedMemoryBatches(stream, rows.toSeq, q)
      s.read.parquet(state)
        .select("user_id", "ts", "event_id", "event_type", "value")
        .orderBy("user_id")
    }),

    // T7 END-TO-END UNDER THE ORACLE: streaming dedup
    // ([[Streaming.streamingDedup]] — watermark-bounded dropDuplicates,
    // ReplacingMergeTree's online analog) actually EXECUTED: the events
    // fixture streams in TIME ORDER (so the watermark never outruns a
    // first occurrence) through three micro-batches, each batch carrying
    // every row TWICE (in-batch duplicates) plus a resend of the
    // previous batch's tail (cross-batch duplicates against retained
    // state). The appended output must be exactly one row per event_id —
    // the plain events table — hash-checked by the oracle. Fresh temp
    // dirs per invocation keep repeated driver runs deterministic; the
    // collect feeding MemoryStream is broker stand-in scaffolding, as in
    // q_stream_upsert.
    "q_stream_dedup" -> ((s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = Tables(s, dir, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
                col("event_type"), col("value"))
        .orderBy("ts", "event_id")
        .as[(Long, java.sql.Timestamp, Long, String, Double)]
        .collect()
      val scratch = java.nio.file.Files
        .createTempDirectory("graft-stream-dedup").toString
      val stream =
        MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
      val deduped = Streaming.streamingDedup(
        stream.toDF().toDF("event_id", "ts", "user_id", "event_type",
                           "value"),
        "ts", "2 hours", Seq("event_id"))
      val q = Streaming.appendSink(deduped, s"$scratch/out",
                                   s"$scratch/ckpt").start()
      // index-based slicing: no second materialized copy of the fixture
      // lives on the driver beyond `rows` itself (broker stand-in)
      val sliceLen = math.max(1, rows.length / 3 + 1)
      var start = 0
      while (start < rows.length) {
        val slice = rows.slice(start, math.min(rows.length,
                                               start + sliceLen)).toSeq
        // resend only previous-batch tail rows INSIDE the 2 h lateness
        // of that batch's max event time (the watermark): those provably
        // probe retained dedup STATE. Tail rows older than the lateness
        // would just be dropped by the late filter — duplicate-safe too,
        // but exercising nothing (at sf0.001 a fixed 10-row tail spans
        // ~6.5 h of event time, so most of it would be late). The
        // previous max itself always qualifies, so every cross-batch
        // seam tests the state path at least once.
        val resend =
          if (start == 0) Seq.empty
          else {
            val prevMaxMs = rows(start - 1)._2.getTime
            rows.slice(math.max(0, start - 10), start)
              .filter(_._2.getTime >= prevMaxMs - 2L * 3600 * 1000)
              .toSeq
          }
        stream.addData(resend ++ slice ++ slice)
        q.processAllAvailable()
        start += sliceLen
      }
      q.stop()
      s.read.parquet(s"$scratch/out")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("event_id")
    }),

    // T6 END-TO-END UNDER THE ORACLE: watermark late-row drop
    // ([[Streaming.watermarkedTumblingCounts]]) actually EXECUTED with a
    // deliberately out-of-order feed. Batch 1 = the ON-TIME rows (last
    // 12 h, including the global max ts) — after it the watermark sits
    // at max−10 min. Batch 2 = everything OLDER than the cutoff: every
    // such row's 10-min window closed at least 11 h 50 min before the
    // watermark, so the stateful aggregate drops ALL of them — the
    // documented discard semantics, observed not asserted. Batch 3 is
    // one far-future flush sentinel whose only job is to push the
    // watermark past every real window so append mode emits them; its
    // own window can never finalize (the watermark trails its event
    // time by the lateness), so the sentinel itself is structurally
    // excluded from the output. Result = tumbling counts of the on-time
    // rows only, which is exactly the oracle's WHERE clause.
    "q_stream_watermark" -> ((s, dir) => {
      // file-source feed, like T3/T4/T5: slice 0 = the on-time rows
      // (>= max − 12 h), slice 1 = everything OLDER arriving late
      // behind them (an empty late file is a harmless 0-row trigger,
      // unlike a MemoryStream add), slice 2 = the flush sentinel. The
      // only driver-side value is the 1-row max(ts) stat.
      val src = Tables(s, dir, "events")
        .select(col("ts"), col("event_type"))
        .filter(col("ts").isNotNull)
      val maxRow = src.agg(max("ts")).head()
      if (maxRow.isNullAt(0)) {
        // empty fixture: the oracle returns zero rows; match its shape
        s.createDataFrame(
          s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("w_start",
              org.apache.spark.sql.types.TimestampType),
            org.apache.spark.sql.types.StructField("event_type",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("n",
              org.apache.spark.sql.types.LongType, nullable = false))))
      } else {
        val maxTs = maxRow.getTimestamp(0)
        val cutoff =
          java.sql.Timestamp.from(maxTs.toInstant.minusSeconds(12L * 3600))
        val sentTs =
          java.sql.Timestamp.from(maxTs.toInstant.plusSeconds(2L * 3600))
        val scratch = java.nio.file.Files
          .createTempDirectory("graft-stream-wm").toString
        val sentinel = s.sql(
          s"SELECT TIMESTAMP '$sentTs' AS ts, '__flush' AS event_type")
        new org.apache.hadoop.fs.Path(s"$scratch/feed")
          .getFileSystem(s.sparkContext.hadoopConfiguration)
          .mkdirs(new org.apache.hadoop.fs.Path(s"$scratch/feed"))
        val stream = s.readStream
          .schema("ts TIMESTAMP, event_type STRING")
          .parquet(s"$scratch/feed")
        val agg = Streaming.watermarkedTumblingCounts(
          stream, "ts", "10 minutes", "10 minutes")
        val q = Streaming.appendSink(agg, s"$scratch/out",
                                     s"$scratch/ckpt").start()
        feedFiles(s, s"$scratch/feed", Seq(
          src.filter(col("ts") >= lit(cutoff)),
          src.filter(col("ts") < lit(cutoff)),
          sentinel), q)
        s.read.parquet(s"$scratch/out")
          .select("w_start", "event_type", "n")
          .orderBy("w_start", "event_type")
      }
    }),

    // T8 END-TO-END UNDER THE ORACLE: the incremental per-key state
    // sink ([[Streaming.incrementalAggSink]] — the AggregatingMergeTree
    // / SummingMergeTree analog: per-batch partials merged into a
    // hive-partitioned state store through the staged
    // mergeTouchedPartitions crash discipline) actually EXECUTED over a
    // three-micro-batch feed. The summed value rides the floor-e4
    // integer grid (long sums are exact and associative, so the
    // batch-merge order can never move a hash), and the final STATE
    // READ — not a recomputation — must equal the plain batch
    // group-by: cross-batch merge, touched-partition pruning, and
    // marker replay protection all sit on the hash path.
    "q_stream_agg" -> ((s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = Tables(s, dir, "events")
        .select(col("event_type"), col("user_id"),
                floor(col("value") * 10000).cast("long").as("value_i"))
        .orderBy("event_type", "user_id", "value_i")
        .as[(String, Long, Long)]
        .collect()
      val scratch = java.nio.file.Files
        .createTempDirectory("graft-stream-agg").toString
      val state = s"$scratch/state"
      val stream = MemoryStream[(String, Long, Long)]
      val q = Streaming.incrementalAggSink(
        stream.toDF().toDF("event_type", "user_id", "value_i"),
        state, s"$scratch/ckpt", "event_type", Seq("user_id"),
        "value_i").start()
      Streaming.feedMemoryBatches(stream, rows.toSeq, q)
      s.read.parquet(state)
        .select("event_type", "user_id", "n", "sum_value")
        .orderBy("event_type", "user_id")
    }),

    // T7+L1 END-TO-END UNDER THE ORACLE: continuous exact dedup against
    // the FULL corpus history ([[Streaming.dedupAgainstHistorySink]] —
    // hash-bucketed append-only seen-store, per-batch anti-join,
    // compactEvery = 2 fires the store compaction swap mid-run). Each
    // batch after the first resends a ~32-row every-Nth sample of ALL
    // prior rows (feedMemoryBatches resendPrior), so the history
    // anti-join must suppress duplicates whose hashes landed across the
    // store's buckets in ANY earlier batch — batch 2's resends probe
    // the store AFTER the compaction swap, putting compaction
    // durability on the oracle path (sf0.1 also carries 8 genuine
    // duplicate texts). The output rows reduce to content md5s — which
    // batch-internal row of a duplicate text survives is
    // parallelism-dependent, but its CONTENT is not — so the appended
    // corpus must equal exactly the distinct text set: a duplicate
    // slipping the anti-join, a store hash lost by compaction
    // (re-emission), or a dropped novel row all move the hash.
    "q_stream_dedup_hist" -> ((s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .orderBy("doc_id")
        .as[(Long, String)]
        .collect()
      if (rows.isEmpty) {
        // empty fixture: the oracle returns zero rows; match its shape
        s.createDataFrame(
          s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("text_md5",
              org.apache.spark.sql.types.StringType))))
      } else {
        val scratch = java.nio.file.Files
          .createTempDirectory("graft-stream-dhist").toString
        val out = s"$scratch/out"
        val stream = MemoryStream[(Long, String)]
        val q = Streaming.dedupAgainstHistorySink(
          stream.toDF().toDF("doc_id", "text"), "text", out,
          s"$scratch/store", s"$scratch/ckpt", numBuckets = 16,
          compactEvery = 2).start()
        Streaming.feedMemoryBatches(stream, rows.toSeq, q,
                                    resendPrior = 32)
        s.read.parquet(out)
          .select(md5(col("text")).as("text_md5"))
          .orderBy("text_md5")
      }
    })
  )

  val oracles: Map[String, String] = Map(
    "q_stream_tumbling" ->
      """SELECT time_bucket(INTERVAL '10 minutes', ts) AS w_start,
        |  event_type, count(*) AS n
        |FROM events GROUP BY w_start, event_type
        |ORDER BY w_start NULLS FIRST, event_type NULLS FIRST""".stripMargin,

    "q_stream_sliding" ->
      """SELECT w_start, count(*) AS n FROM (
        |  SELECT time_bucket(INTERVAL '5 minutes', ts) - to_minutes(s.k * 5)
        |           AS w_start, ts
        |  FROM events, (VALUES (0), (1)) s(k)) t
        |WHERE ts >= w_start AND ts < w_start + INTERVAL '10 minutes'
        |GROUP BY w_start ORDER BY w_start NULLS FIRST""".stripMargin,

    // the streamed run sums on the floor-e4 integer grid (exact,
    // merge-order-independent) — the oracle integerizes identically
    "q_stream_session" ->
      """WITH flagged AS (
        |  SELECT user_id, ts,
        |    CAST(floor(value * 10000) AS BIGINT) AS value_e4,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), numbered AS (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT user_id, min(ts) AS s_start, count(*) AS n,
        |  CAST(sum(value_e4) AS BIGINT) AS sum_value_e4
        |FROM numbered GROUP BY user_id, sid
        |ORDER BY user_id NULLS FIRST, s_start NULLS FIRST""".stripMargin,

    // the streamed 3-batch upsert ends at exactly the batch latest
    // state — same SQL as q_upsert_latest by design
    "q_stream_upsert" ->
      """SELECT user_id, ts, event_id, event_type, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id NULLS FIRST""".stripMargin,

    // every event sent 2-3 times across the batches; the streamed dedup
    // must end at exactly the plain events table
    "q_stream_dedup" ->
      """SELECT event_id, ts, user_id, event_type, value
        |FROM events ORDER BY event_id NULLS FIRST""".stripMargin,

    // only the last-12h rows survive the watermark; the late batch's
    // windows all closed >11h before the watermark and must vanish
    "q_stream_watermark" ->
      """SELECT time_bucket(INTERVAL '10 minutes', ts) AS w_start,
        |  event_type, count(*) AS n
        |FROM events
        |WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL '12 hours'
        |GROUP BY w_start, event_type
        |ORDER BY w_start NULLS FIRST, event_type NULLS FIRST""".stripMargin,

    // the three-batch incremental state store must END at the plain
    // batch group-by (floor-e4 integer sums are merge-order-exact)
    "q_stream_agg" ->
      """SELECT event_type, user_id, count(*) AS n,
        |  CAST(sum(CAST(floor(value * 10000) AS BIGINT)) AS BIGINT)
        |    AS sum_value
        |FROM events GROUP BY event_type, user_id
        |ORDER BY event_type NULLS FIRST, user_id NULLS FIRST""".stripMargin,

    // duplicates resent across batches (plus sf0.1's 8 genuine ones)
    // must all be suppressed: the deduped corpus = the distinct text set
    "q_stream_dedup_hist" ->
      """SELECT DISTINCT md5(text) AS text_md5 FROM documents
        |ORDER BY text_md5 NULLS FIRST""".stripMargin
  )
}
