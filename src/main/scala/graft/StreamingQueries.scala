package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Streaming operators under the cross-engine oracle (SURVEY.md §2.9).
  * Every executed key (T1/T3/T4/T5/T6/T7/T8) runs as a real multi-batch
  * Structured Streaming job inside the key, fed through the FILE source
  * ([[Streaming.feedFiles]]: hash- or time-assigned slices written as
  * single parquet files, one micro-batch per slice by construction) —
  * no driver-side staging of fixture rows anywhere; the only collected
  * values are bounded per-slice STATS (a max(ts), slice boundaries).
  * Hash-checked in DuckDB (time_bucket for tumbling/sliding,
  * gaps-and-islands for session windows, latest-per-key for upsert).
  * Additional batch/stream parity is asserted in StreamingSpec with
  * MemoryStream.
  */
object StreamingQueries extends QueryPack {

  // fixture event times span 30 days; a 45-day lateness makes the
  // deliberately shuffled feed drop nothing, and sentinel = max + 46 d
  // puts the final watermark (sentinel − lateness = max + 1 d) past
  // every real window end without ever finalizing the sentinel's own
  private val WindowLateness = "45 days"
  private def sentinelTs(maxTs: java.sql.Timestamp): java.sql.Timestamp =
    java.sql.Timestamp.from(maxTs.toInstant.plusSeconds(46L * 24 * 3600))

  private def feedFiles(s: org.apache.spark.sql.SparkSession,
                        feedDir: String,
                        slices: Seq[org.apache.spark.sql.DataFrame],
                        q: org.apache.spark.sql.streaming.StreamingQuery)
      : Unit = Streaming.feedFiles(s, feedDir, slices, q)

  /** The file source requires its path to exist at stream start; feeds
    * begin empty, so create the dir and return it.
    */
  private def mkFeed(s: org.apache.spark.sql.SparkSession,
                     path: String): String = {
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
      .mkdirs(new org.apache.hadoop.fs.Path(path))
    path
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
    // Streaming job inside the key — the events fixture streams
    // through the FILE source in three hash-assigned micro-batches
    // (versions of one key scatter ACROSS batches, so the bucketed
    // merge must resolve latest-state across batch seams, not within
    // one) into [[Streaming.upsertSink]], and the returned frame is
    // the FINAL-state read, hash-checked against the plain
    // latest-per-key SQL (the same oracle as the batch
    // q_upsert_latest). No driver-side data staging (r13 verdict task
    // 5); fresh temp state/checkpoint per invocation keeps repeated
    // driver runs deterministic.
    "q_stream_upsert" -> ((s, dir) => {
      val scratch = java.nio.file.Files
        .createTempDirectory("graft-stream-upsert").toString
      val state = s"$scratch/state"
      val src = Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
                col("event_type"), col("value"),
                pmod(xxhash64(col("event_id")), lit(3)).as("slice"))
      val stream = s.readStream
        .schema("user_id BIGINT, ts TIMESTAMP, event_id BIGINT, " +
                "event_type STRING, value DOUBLE")
        .parquet(mkFeed(s, s"$scratch/feed"))
      val q = Streaming.upsertSink(stream, state, s"$scratch/ckpt",
                                   Seq("user_id"),
                                   Seq("ts", "event_id")).start()
      feedFiles(s, s"$scratch/feed",
        (0 until 3).map(i => src.filter(col("slice") === i)
          .select("user_id", "ts", "event_id", "event_type", "value")), q)
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
    // slices land as parquet FILES via [[Streaming.feedFiles]] (the
    // since-r14 broker stand-in: a real file source, no driver-side row
    // staging — only the bounded per-slice STATS above are collected),
    // as in q_stream_upsert.
    "q_stream_dedup" -> ((s, dir) => {
      val scratch = java.nio.file.Files
        .createTempDirectory("graft-stream-dedup").toString
      val src = Tables(s, dir, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
                col("event_type"), col("value"))
      // time-ordered slices (the watermark must never outrun a first
      // occurrence): three equal spans of the fixture's event-time
      // range; null-ts rows ride slice 0. The only driver-side values
      // are the span boundaries and per-slice maxima — bounded STATS,
      // not rows.
      val boundsRow = src
        .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
        .head()
      val (tLo, tHi) =
        if (boundsRow.isNullAt(0)) (0L, 0L) // empty fixture: one slice
        else (boundsRow.getLong(0), boundsRow.getLong(1))
      val sliced = src.withColumn("slice",
        least(lit(2), floor(lit(3) *
          (coalesce(unix_micros(col("ts")), lit(tLo)) - lit(tLo)) /
          (lit(tHi) - lit(tLo) + 1))).cast("int"))
      // all-null-ts slices (possible when bounds fall back to (0, 0)
      // and every row rides slice 0) have a null max — drop them from
      // the map; the resend below already treats a missing key as
      // "nothing to resend" via sliceMaxUs.get
      val sliceMaxUs = sliced.groupBy("slice")
        .agg(max(unix_micros(col("ts"))).as("m"))
        .collect().filterNot(_.isNullAt(1))
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val stream = s.readStream
        .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
                "event_type STRING, value DOUBLE")
        .parquet(mkFeed(s, s"$scratch/feed"))
      val deduped = Streaming.streamingDedup(
        stream, "ts", "2 hours", Seq("event_id"))
      val q = Streaming.appendSink(deduped, s"$scratch/out",
                                   s"$scratch/ckpt").start()
      // batch i = slice i TWICE (in-batch duplicates) + the previous
      // slice's rows inside the 2 h lateness of its max event time
      // (cross-batch duplicates that provably probe retained dedup
      // STATE — older resends would just be dropped by the late filter)
      def sliceDf(i: Int) = sliced.filter(col("slice") === i)
        .select("event_id", "ts", "user_id", "event_type", "value")
      val slices = (0 until 3).map { i =>
        val resend =
          if (i == 0) None
          else sliceMaxUs.get(i - 1).map(prevMax =>
            sliceDf(i - 1).filter(
              unix_micros(col("ts")) >= prevMax - 2L * 3600 * 1000000))
        resend.foldLeft(sliceDf(i).union(sliceDf(i)))(_ union _)
      }
      feedFiles(s, s"$scratch/feed", slices, q)
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
      val scratch = java.nio.file.Files
        .createTempDirectory("graft-stream-agg").toString
      val state = s"$scratch/state"
      // hash-assigned slices: rows of one (event_type, user_id) group
      // scatter across batches, so per-batch partials must MERGE in the
      // state store (floor-e4 long sums — exact and associative, so
      // batch assignment can never move the hash); file-source feed,
      // no driver staging
      val src = Tables(s, dir, "events")
        .select(col("event_type"), col("user_id"),
                floor(col("value") * 10000).cast("long").as("value_i"),
                pmod(xxhash64(col("event_id")), lit(3)).as("slice"))
      val stream = s.readStream
        .schema("event_type STRING, user_id BIGINT, value_i BIGINT")
        .parquet(mkFeed(s, s"$scratch/feed"))
      val q = Streaming.incrementalAggSink(
        stream, state, s"$scratch/ckpt", "event_type", Seq("user_id"),
        "value_i").start()
      feedFiles(s, s"$scratch/feed",
        (0 until 3).map(i => src.filter(col("slice") === i)
          .select("event_type", "user_id", "value_i")), q)
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
      val n = Tables(s, dir, "documents").count()
      if (n == 0) {
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
        // hash-assigned slices; batch i > 0 additionally RESENDS a
        // deterministic ~32-row sample of every PRIOR slice, so the
        // history anti-join must suppress duplicates whose hashes
        // entered the store in ANY earlier batch — batch 2's resends
        // probe the store AFTER the compactEvery=2 swap, keeping
        // compaction durability on the oracle path. File-source feed;
        // the only driver value is the fixture count sizing the sample.
        val src = Tables(s, dir, "documents")
          .select(col("doc_id"), col("text"),
                  pmod(xxhash64(col("doc_id")), lit(3)).as("slice"))
        val sampleMod = math.max(1L, n / 32)
        val stream = s.readStream
          .schema("doc_id BIGINT, text STRING")
          .parquet(mkFeed(s, s"$scratch/feed"))
        val q = Streaming.dedupAgainstHistorySink(
          stream, "text", out,
          s"$scratch/store", s"$scratch/ckpt", numBuckets = 16,
          compactEvery = 2).start()
        def sliceDf(i: Int) = src.filter(col("slice") === i)
          .select("doc_id", "text")
        val slices = (0 until 3).map { i =>
          val resend = src.filter(col("slice") < i &&
              pmod(xxhash64(col("doc_id"), lit(7)), lit(sampleMod)) === 0)
            .select("doc_id", "text")
          if (i == 0) sliceDf(i) else resend.union(sliceDf(i))
        }
        feedFiles(s, s"$scratch/feed", slices, q)
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
