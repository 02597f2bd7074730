package graft

import org.apache.spark.sql.{DataFrame, Column, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Structured-streaming layer (SURVEY.md §2.9, T1-T8).
  *
  * The reference's continuous path — ClickHouse Kafka-engine table
  * (`/root/reference/README.md:197-202`) → materialized-view transform
  * (`README.md:212-231`) → append into the ReplacingMergeTree final table
  * (`README.md:212`) — is exactly Spark's micro-batch loop: the MV firing
  * per consumed block ≡ `foreachBatch` firing per micro-batch. Watermarks
  * and checkpointing make explicit what the reference leaves implicit
  * (at-least-once, no lateness handling).
  *
  * These are DataFrame→DataFrame transforms usable on both batch and
  * streaming frames (tested for batch/stream parity in StreamingSpec); the
  * sink builders wire the streaming-only parts (watermark, output mode,
  * checkpoint).
  */
object Streaming {

  /** MemoryStream feed loop for SPEC-level parity tests
    * (StreamingSpec; the executed oracle keys all feed the FILE source
    * via [[feedFiles]] since r14): feed `rows` into a MemoryStream in
    * `batches` roughly equal, order-preserving slices, draining the
    * running query after each, then stop it. Harness scaffolding, not
    * operator cost — the sinks under test do the distributed work.
    *
    * `resendPrior` > 0 (DEDUP-shaped sinks only — an additive sink
    * would double-count): each batch after the first is prefixed with
    * an every-Nth deterministic sample of ≈`resendPrior` rows drawn
    * from ALL prior slices, so the sink must suppress duplicates whose
    * state entered the store in ANY earlier batch — including before a
    * mid-run store compaction, which puts compaction durability across
    * the store's hash buckets on the oracle path, not just the last
    * batch's tail.
    */
  def feedMemoryBatches[T](
      stream: org.apache.spark.sql.execution.streaming.runtime.MemoryStream[T],
      rows: Seq[T], q: org.apache.spark.sql.streaming.StreamingQuery,
      batches: Int = 3, resendPrior: Int = 0): Unit = {
    // index-arithmetic slicing: beyond the caller's `rows` (the
    // documented broker stand-in), the driver retains NOTHING — no
    // materialized slice list, and the every-Nth prior-row resend
    // sample (~resendPrior rows probing cross-batch dedup/merge state)
    // is recomputed per batch as O(resendPrior) index lookups into
    // `rows` instead of re-flattening all prior slices
    val n = rows.length
    val sliceLen = math.max(1, n / batches + 1)
    var start = 0
    while (start < n) {
      val resend =
        if (resendPrior <= 0 || start == 0) Seq.empty[T]
        else {
          val step = math.max(1, start / resendPrior)
          (0 until start by step).map(rows)
        }
      stream.addData(resend ++ rows.slice(start, math.min(n, start + sliceLen)))
      q.processAllAvailable()
      start += sliceLen
    }
    q.stop()
  }

  /** One feed slice → ONE parquet file in `feedDir` (executor write,
    * executor read; the driver never touches row data): write to a
    * staging dir, rename the single part file to a deterministic slice
    * name, drop the staging dir. Shared by every executed streaming key
    * that feeds the file source ([[feedFiles]]).
    */
  private[graft] def writeSliceFile(s: org.apache.spark.sql.SparkSession,
                                    feedDir: String, i: Int,
                                    df: DataFrame): Unit = {
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
    * drain, repeat — then stop. The feed dir must start empty; each
    * slice is exactly one micro-batch in exactly the given order BY
    * CONSTRUCTION (no reliance on the file source's listing order).
    * This is the broker stand-in WITHOUT driver-side data staging —
    * the file-source replacement for [[feedMemoryBatches]] (r13 verdict
    * task 5: zero `collect()` of fixture rows in executed keys).
    */
  private[graft] def feedFiles(s: org.apache.spark.sql.SparkSession,
                               feedDir: String, slices: Seq[DataFrame],
                               q: org.apache.spark.sql.streaming
                                 .StreamingQuery): Unit = {
    slices.zipWithIndex.foreach { case (df, i) =>
      writeSliceFile(s, feedDir, i, df)
      q.processAllAvailable()
    }
    q.stop()
  }

  /** T1: the reference MV's transform, generalized — project + rename +
    * epoch-micros conversion (`README.md:222-230`): takes a CDC after-image
    * frame with epoch-micro columns and produces the final-table shape.
    */
  def mvTransform(df: DataFrame, microsCols: Seq[String]): DataFrame =
    microsCols.foldLeft(df)((d, c) =>
      d.withColumn(c, Functions.microsToTimestampSecond(col(c))))

  /** Replay guard for `foreachBatch` sinks whose writes are NOT naturally
    * idempotent (appends, partial-aggregate merges): Structured Streaming
    * re-delivers the in-flight batch after a crash, so each sink records
    * a marker per committed batch id and skips re-delivered ones. The
    * marker write happens AFTER the data write — a crash between the two
    * replays the batch (at-least-once on that one batch), never loses it.
    */
  private[graft] def alreadyCommitted(spark: org.apache.spark.sql.SparkSession,
                                      dir: String, batchId: Long): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_graft_commits/$batchId")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private[graft] def markCommitted(spark: org.apache.spark.sql.SparkSession,
                                   dir: String, batchId: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_graft_commits/$batchId")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .create(p, true).close()
  }

  /** Null-aware membership test for a touched-partition list: a plain
    * `isin(touched)` evaluates to NULL — filtered out — for stored
    * null-partition rows, which would exclude the accumulated null
    * group from the merge and silently reset it to the batch's own
    * contribution on every swap.
    */
  private[graft] def inTouched(c: Column, touched: Seq[Any]): Column = {
    val nonNull = touched.filterNot(_ == null)
    val base = if (nonNull.isEmpty) lit(false) else c.isin(nonNull: _*)
    if (touched.exists(_ == null)) base || c.isNull else base
  }

  /** True iff `dir` carries a completion tag — a `_merged_*` file (the
    * swap sinks' seal) or [[Sources.CompactCompleteTag]] (the
    * whole-dir compaction's). The tag is created INSIDE the tmp only
    * after its parquet write finished, so tag presence — never the
    * live dir's mere existence — is the proof a tmp is complete and
    * promotable/servable.
    */
  private[graft] def hasMergedTag(fs: org.apache.hadoop.fs.FileSystem,
                                  dir: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(dir) &&
      fs.listStatus(dir).exists { st =>
        val n = st.getPath.getName
        n.startsWith("_merged_") || n == Sources.CompactCompleteTag
      }

  /** Entry recovery for the tagged tmp→live swap shared by the scatter /
    * k-means / projection / inverted-index sinks. Two torn-crash shapes:
    *
    *  - TAGGED tmp: complete and strictly newer than whatever remains of
    *    the live dir. The swap's `fs.delete(live)` is NOT atomic — a
    *    crash mid-delete leaves a PARTIAL live dir, so "live exists ⇒
    *    keep live" would re-merge against half a store (or, on the
    *    first seeding batch where live never existed, an unconditional
    *    promote would install a torn tmp). Promote unconditionally:
    *    finish deleting the live dir, then rename.
    *  - UNTAGGED tmp: the writer died before sealing it — the live dir
    *    (if the store ever seeded) is still fully intact, and on a
    *    first-batch crash neither dir exists and the replay recomputes.
    *    Drop the tmp.
    */
  private[graft] def recoverSwap(fs: org.apache.hadoop.fs.FileSystem,
                                 live: org.apache.hadoop.fs.Path,
                                 tmp: org.apache.hadoop.fs.Path): Unit =
    if (fs.exists(tmp)) {
      if (hasMergedTag(fs, tmp)) {
        if (fs.exists(live)) fs.delete(live, true)
        fs.rename(tmp, live)
      } else fs.delete(tmp, true)
    }

  /** Idempotent per-batch append — the effectively-once replacement for
    * `mode("append")` on a replayable micro-batch: the batch
    * materializes BESIDE the destination, then its files move in under
    * deterministic `batch<id>-<i>` names (optionally inside single-level
    * `partitionBy` hive dirs), a replay clearing its own name prefix
    * first. A plain append writes fresh UUID part files, so a crash
    * between the append and the batch marker would duplicate the
    * batch's rows on replay; with deterministic names the replayed
    * append overwrites exactly itself.
    */
  private[graft] def idempotentAppend(batch: DataFrame, dir: String,
                                      batchId: Long,
                                      partitionCol: Option[String] = None)
      : Unit = {
    val spark = batch.sparkSession
    val dst = new org.apache.hadoop.fs.Path(dir)
    val tmp = new org.apache.hadoop.fs.Path(dir + s".batch$batchId.tmp")
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val w = batch.write.mode("overwrite")
    partitionCol.fold(w)(c => w.partitionBy(c)).parquet(tmp.toString)
    val prefix = s"batch$batchId-"
    def moveIn(from: org.apache.hadoop.fs.Path,
               to: org.apache.hadoop.fs.Path): Unit = {
      fs.mkdirs(to)
      fs.listStatus(to)
        .filter(_.getPath.getName.startsWith(prefix))
        .foreach(st => fs.delete(st.getPath, false))
      fs.listStatus(from)
        .filter(_.getPath.getName.endsWith(".parquet"))
        .sortBy(_.getPath.getName) // stable task-file order across replays
        .zipWithIndex
        .foreach { case (st, i) =>
          fs.rename(st.getPath,
                    new org.apache.hadoop.fs.Path(to, f"$prefix$i%05d.parquet"))
        }
    }
    partitionCol match {
      case None => moveIn(tmp, dst)
      case Some(c) =>
        fs.listStatus(tmp)
          .filter(st => st.isDirectory &&
                        st.getPath.getName.startsWith(c + "="))
          .foreach(st => moveIn(
            st.getPath,
            new org.apache.hadoop.fs.Path(dst, st.getPath.getName)))
    }
    fs.delete(tmp, true)
  }

  /** Staged, RESUMABLE overwrite of the touched `partitionCol`
    * partitions of a state store — the crash-safe replacement for an
    * in-place dynamic partition overwrite, whose commit deletes each
    * target partition dir before renaming its replacement in: a crash
    * inside that window loses the partition outright, and a replay
    * that recomputes against the half-committed store bakes the loss
    * in. Here `merged` (the complete post-merge content of every
    * touched partition, computed from PRE-batch state) stages beside
    * the store under `<stateDir><stagingSuffix>` with a `_complete`
    * tag, then exactly those partition dirs swap in (delete target,
    * rename staged — each partition flips atomically). A replay that
    * finds the tag skips the recompute and RESUMES the swap
    * (already-renamed partitions are simply no longer listed in the
    * staging dir). The staging dir is NOT cleaned here: callers whose
    * merge is non-idempotent must commit their batch marker BEFORE
    * deleting it (see [[mergeTouchedPartitions]]); idempotent callers
    * ([[upsertBatch]]) delete it right after.
    */
  private[graft] def stagedPartitionSwap(
      spark: SparkSession, stateDir: String, partitionCol: String,
      stagingSuffix: String)(merged: => DataFrame)
      : org.apache.hadoop.fs.Path = {
    val state = new org.apache.hadoop.fs.Path(stateDir)
    val fs = state.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(stateDir + stagingSuffix)
    val tag = new org.apache.hadoop.fs.Path(tmp, "_complete")
    if (!fs.exists(tag)) {
      val m = merged
      if (fs.exists(tmp)) fs.delete(tmp, true)
      m.write.mode("overwrite").partitionBy(partitionCol)
        .parquet(tmp.toString)
      fs.create(tag, true).close()
    }
    fs.mkdirs(state)
    fs.listStatus(tmp)
      .filter(st => st.isDirectory &&
                    st.getPath.getName.startsWith(partitionCol + "="))
      .foreach { st =>
        val dst = new org.apache.hadoop.fs.Path(state, st.getPath.getName)
        if (fs.exists(dst)) fs.delete(dst, true)
        fs.rename(st.getPath, dst)
      }
    tmp
  }

  /** Crash-safe ADDITIVE merge of one batch into a hive-partitioned
    * state store — the write discipline behind the incremental-agg /
    * distinct / top-k / EMA sinks. The in-place dynamic overwrite those
    * merges previously used has two torn-crash failure modes: the
    * commit's per-partition delete→rename window can LOSE a partition
    * outright, and a crash after a partial commit makes the replay
    * recompute against HALF-merged state — the merge is additive, so
    * the re-merged partitions double-count the batch.
    *
    * Discipline: `merged` (the post-merge rows for every touched
    * partition, computed from the PRE-batch state) stages beside the
    * store under `<stateDir>.merge_batch=<id>` with a completeness tag,
    * then exactly those partition dirs swap in (delete target, rename
    * staged — each partition flips atomically). A replay that finds the
    * tag skips the recompute and RESUMES the swap (already-renamed
    * partitions are simply no longer listed in the staging dir); the
    * marker commits BEFORE the staging cleanup, so a committed batch
    * can never be recomputed against post-batch state.
    */
  private[graft] def mergeTouchedPartitions(
      spark: SparkSession, stateDir: String, partitionCol: String,
      batchId: Long)(merged: => DataFrame): Unit = {
    val state = new org.apache.hadoop.fs.Path(stateDir)
    val fs = state.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val suffix = s".merge_batch=$batchId"
    // stranded staging of a PRIOR batch (crash between its marker and
    // cleanup) is safe to drop: were that batch uncommitted, the engine
    // would be replaying IT right now, not this one
    val parent = state.getParent
    if (parent != null && fs.exists(parent)) {
      val prefix = state.getName + ".merge_batch="
      fs.listStatus(parent).map(_.getPath)
        .filter(p => p.getName.startsWith(prefix) &&
                     p.getName != state.getName + suffix)
        .foreach(p => fs.delete(p, true))
    }
    val tmp = stagedPartitionSwap(spark, stateDir, partitionCol,
                                  suffix)(merged)
    markCommitted(spark, stateDir, batchId)
    fs.delete(tmp, true)
  }

  /** T1/T2: continuous ingest — append each micro-batch to a parquet dir
    * (the MV's `TO shop.users` insert) with exactly-once progress:
    * checkpointing bounds re-delivery to the in-flight batch, the
    * commit marker makes a fully-committed replay a no-op, and the
    * [[idempotentAppend]] deterministic file names make a replay INSIDE
    * the append→marker crash window overwrite itself instead of
    * duplicating the batch's rows.
    */
  def appendSink(df: DataFrame, outDir: String, checkpoint: String)
      : DataStreamWriter[Row] =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!alreadyCommitted(batch.sparkSession, outDir, batchId)) {
          idempotentAppend(batch, outDir, batchId)
          markCommitted(batch.sparkSession, outDir, batchId)
        }
      }

  /** T1+U1: the reference's full loop — continuous ingest with
    * upsert-on-batch (`foreachBatch` merge). This is the deterministic,
    * synchronous analog of Kafka-engine → MV → ReplacingMergeTree
    * background merges (`/root/reference/README.md:197-231`, `:176`).
    * State lives in a compacted parquet dir, not in executor memory —
    * restart-safe together with the checkpoint.
    *
    * The state dir is hash-bucketed on the entity key
    * (`__bucket = pmod(xxhash64(keys), numBuckets)` hive partitions), and
    * each micro-batch rewrites ONLY the buckets its keys touch, via
    * dynamic partition overwrite: per batch the merge reads the touched
    * buckets (partition-pruned scan), unions the batch, re-collapses to
    * the latest version per key, and overwrites just those partitions.
    * Cost per batch is O(touched state), not O(total state) — the
    * difference between a standing 100 TB upsert table and one that dies
    * at its first big compaction. At scale, `numBuckets` tracks total
    * state size / target-file-size. (A table format with MERGE — Delta,
    * Iceberg — is the managed version of exactly this layout.)
    */
  /** The reference pipeline's destination leg as a streaming sink: each
    * micro-batch collapses to its latest version per key ([[Cdc.latest]])
    * and upserts into a serving RDBMS ([[Sources.jdbcUpsertSink]]).
    * Upsert is naturally idempotent, so post-crash batch re-delivery
    * needs no commit markers — replaying a batch rewrites the same rows
    * to the same values.
    */
  def jdbcUpsertStreamSink(df: DataFrame, url: String, table: String,
                           keys: Seq[String], version: Seq[String],
                           checkpoint: String): DataStreamWriter[Row] =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val latest = Cdc.latest(batch, keys, version.map(col))
        Sources.jdbcUpsertSink(latest, url, table, keys)
      }

  def upsertSink(df: DataFrame, stateDir: String, checkpoint: String,
                 keys: Seq[String], version: Seq[String],
                 numBuckets: Int = 16): DataStreamWriter[Row] =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsertBatch(batch, stateDir, keys, version, numBuckets)
      }

  /** One bucketed-upsert merge of `batch` into `stateDir` — the body of
    * [[upsertSink]] (see its scaladoc for the touched-bucket mechanics),
    * shared with [[multiTableSink]]'s per-table leg. Idempotent: the
    * merge is a deterministic collapse + dynamic overwrite, so a
    * replayed batch rewrites the same buckets to the same content — no
    * commit marker needed.
    */
  private[graft] def upsertBatch(batch: DataFrame, stateDir: String,
                                 keys: Seq[String], version: Seq[String],
                                 numBuckets: Int): Unit = {
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val withBucket = batch.withColumn("__bucket",
      pmod(xxhash64(keys.map(col): _*), lit(numBuckets)).cast("int"))
    // ≤ numBuckets small ints — a bounded driver-side list, not data
    val touched = withBucket.select("__bucket").distinct()
      .collect().map(_.getInt(0)).toSeq
    // an EMPTY batch (routine for a multi-table route whose topic is
    // quiet this batch) merges nothing — and must not create an
    // empty/parquet-less store a later read would choke on. A tagged
    // staging can't be stranded here either: the engine only delivers
    // an empty batch after the prior batch's foreachBatch RETURNED,
    // which deletes its staging last.
    if (touched.isEmpty) return
    // staged swap, not an in-place dynamic overwrite: the in-place
    // commit's delete→rename window can LOSE a bucket, and the replay's
    // recompute against the torn store would bake the loss in (the
    // pre-batch keys of that bucket absent from this batch vanish). The
    // fixed staging name is safe — micro-batches are serialized per
    // query and multi-table legs write disjoint store dirs — and the
    // merge is an idempotent collapse, so resume-without-recompute on
    // replay converges without commit markers.
    val staging = stagedPartitionSwap(spark, stateDir, "__bucket",
                                      ".merge_upsert") {
      val current =
        try spark.read.parquet(stateDir)
          .filter(col("__bucket").isin(touched: _*)) // partition-pruned
          // eager materialization of ONLY the touched buckets: cuts the
          // file-scan lineage so the swap below isn't replacing a path
          // being read
          .localCheckpoint()
        catch {
          // first batch only: state dir doesn't exist yet (or holds no
          // parquet to infer from). Anything else (permission, corrupt
          // footer, ...) must surface.
          case e: org.apache.spark.sql.AnalysisException
              if e.getCondition == "PATH_NOT_FOUND" ||
                 e.getCondition == "UNABLE_TO_INFER_SCHEMA" =>
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[Row], withBucket.schema)
        }
      Cdc.latest(current.unionByName(withBucket), keys, version.map(col))
        .sortWithinPartitions(keys.map(col): _*)
    }
    fs.delete(staging, true)
  }

  /** Per-table route for [[multiTableSink]]. `topic` selects the
    * table's envelopes out of the shared stream (Debezium names topics
    * `server.schema.table`, `/root/reference/README.md:133,199`);
    * `readerSchemaJson`/`schema` are the table's READER generation —
    * each record's writer generation still resolves through the
    * registry by embedded id; `microsCols` are the epoch-micro columns
    * the MV converts in place (`toDateTime(x / 1000000)`,
    * `README.md:226-227`); `keys`/`version` drive the
    * ReplacingMergeTree-style collapse of the table's final.
    */
  final case class TableRoute(topic: String, table: String,
                              readerSchemaJson: String,
                              schema: org.apache.spark.sql.types.StructType,
                              keys: Seq[String], version: Seq[String],
                              microsCols: Seq[String] = Seq.empty)

  /** T1×N: ONE change stream carrying N tables' Confluent-framed
    * envelopes, routed to N columnar finals in a single `foreachBatch`
    * — the reference's documented growth path
    * (`/root/reference/README.md:277-278` FAQ: scale by adding tables
    * to `table.include.list`, then one Kafka table + one MV per table;
    * here the "N MVs" are N routes over one consumer). Per micro-batch
    * the shared batch materializes ONCE (localCheckpoint — every route
    * re-reads the materialized blocks instead of re-running the source
    * scan N times), then each route filters its topic, decodes through
    * the shared registry (per-topic reader schema, per-record writer
    * schema), applies its MV micros conversion, and merges into its own
    * bucketed upsert state at `baseDir/<table>`. With `quarantineDir`
    * set, frames whose topic matches NO route land in
    * `quarantineDir/__unrouted` raw (topic + value intact) instead of
    * vanishing — the reference's documented growth path is precisely
    * "user adds a table" (`README.md:277-278`), and forgetting the
    * route must not silently lose that table's first events; once the
    * route exists, the quarantined frames replay through
    * [[multiTableBatch]] directly. Replay-safe with NO marker on the
    * table legs: every per-table merge is an idempotent deterministic
    * collapse, so a re-delivered batch rewrites identical state for
    * every table (quarantine appends are at-least-once, like dead
    * letters). The N table legs are independent writes to disjoint
    * state dirs and run CONCURRENTLY (a bounded shared pool submitting
    * jobs on the one SparkSession) — serial legs would inflate
    * micro-batch latency linearly in N on the add-a-table growth path.
    */
  def multiTableSink(df: DataFrame, registry: Sources.SchemaById,
                     routes: Seq[TableRoute], baseDir: String,
                     checkpoint: String,
                     numBuckets: Int = 16,
                     quarantineDir: Option[String] = None)
      : DataStreamWriter[Row] =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        multiTableBatch(batch, registry, routes, baseDir, numBuckets,
                        quarantineDir)
      }

  /** One [[multiTableSink]] micro-batch (package-private so the spec
    * can drive replay windows directly). With `quarantineDir` set,
    * each route decodes through the dead-letter decoder
    * ([[Sources.decodeConfluentSafe]]): a poisoned message lands in
    * `quarantineDir/<table>` instead of failing EVERY table's leg of
    * the batch — on a shared N-table stream, one producer's bad frame
    * must not stall the other N−1 tables. Quarantine appends are
    * at-least-once (a crash-replayed batch may duplicate dead
    * letters — they are diagnostic evidence, not state); the table
    * merges stay effectively-once by idempotence.
    */
  private[graft] def multiTableBatch(batch: DataFrame,
                                     registry: Sources.SchemaById,
                                     routes: Seq[TableRoute],
                                     baseDir: String,
                                     numBuckets: Int,
                                     quarantineDir: Option[String] = None)
      : Unit = {
    val cached = batch.localCheckpoint()
    // route-miss leg FIRST: a topic matching no route is the silent-loss
    // failure mode of the reference's add-a-table growth path — keep the
    // raw frames (topic + value) replayable under __unrouted
    quarantineDir.foreach { qdir =>
      // null-topic frames match NO route leg (=== is null-false), and a
      // bare !isin would be null too — they must quarantine, not vanish
      val unrouted = cached.filter(
        col("topic").isNull || !col("topic").isin(routes.map(_.topic): _*))
      // write only when misses exist — an empty append would leave a
      // parquet-less dir readers can't infer from
      if (!unrouted.isEmpty)
        unrouted.write.mode("append").parquet(s"$qdir/__unrouted")
    }
    def runLeg(rt: TableRoute): Unit = {
      val part = cached.filter(col("topic") === rt.topic)
      val decoded = quarantineDir match {
        case None =>
          Sources.decodeConfluent(part, col("value"), registry,
                                  rt.readerSchemaJson, rt.schema)
        case Some(qdir) =>
          val safe = Sources.decodeConfluentSafe(
            part, col("value"), registry, rt.readerSchemaJson, rt.schema)
            .localCheckpoint() // read twice: quarantine leg + clean leg
          val bad = safe.filter(col("__error").isNotNull)
          // write only when real dead letters exist — an empty append
          // would leave a parquet-less dir readers can't infer from
          if (!bad.isEmpty)
            bad.write.mode("append").parquet(s"$qdir/${rt.table}")
          safe.filter(col("__error").isNull).drop("__error")
      }
      val transformed = rt.microsCols.foldLeft(decoded)((d, c) =>
        d.withColumn(c, Functions.microsToTimestampSecond(col(c))))
      upsertBatch(transformed, s"$baseDir/${rt.table}", rt.keys,
                  rt.version, numBuckets)
    }
    // independent writes to disjoint dirs: submit concurrently. Spark
    // job submission is thread-safe; with the default FIFO scheduler the
    // legs' stages interleave on free cores (configure a fair-scheduler
    // pool named "graft-router" to weight them explicitly). Failures
    // propagate: the micro-batch fails if ANY leg fails, exactly like
    // the serial form, so checkpoint/replay semantics are unchanged.
    if (routes.size <= 1) routes.foreach(runLeg)
    else {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: scala.concurrent.ExecutionContext = routerPool
      // re-stamp the CALLER's job group onto every pool thread per
      // submission: pool workers were spawned by whichever batch first
      // used them and inherit THAT thread's local properties, so
      // without this a second query's legs would run under the first
      // query's group (mis-scoping cancelJobGroup on stop()) and a
      // restarted query's stop() could not cancel its own legs
      val sc = cached.sparkSession.sparkContext
      val callerProps = Seq("spark.jobGroup.id", "spark.job.description",
                            "spark.job.interruptOnCancel")
        .map(k => k -> sc.getLocalProperty(k))
      val legs = routes.map(rt => Future {
        callerProps.foreach { case (k, v) => sc.setLocalProperty(k, v) }
        sc.setLocalProperty("spark.scheduler.pool", "graft-router")
        runLeg(rt)
      })
      // surface the FIRST failure after all legs settle (Future.sequence
      // would abandon still-running legs mid-write on the first error)
      val settled = legs.map(f => Await.ready(f, Duration.Inf).value.get)
      settled.collectFirst { case scala.util.Failure(e) => throw e }
    }
  }

  /** Bounded shared pool for [[multiTableBatch]]'s concurrent route
    * legs — daemon threads so a stuck leg never blocks JVM exit.
    */
  private lazy val routerPool: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutor(
      java.util.concurrent.Executors.newFixedThreadPool(
        8,
        (r: Runnable) => {
          val t = new Thread(r, "graft-router")
          t.setDaemon(true)
          t
        }))

  /** Continuous projection maintenance — the full ClickHouse loop in one
    * sink: each micro-batch appends its raw rows to `baseDir` AND folds
    * its partial aggregates into the projection table at `projDir`
    * ([[ProjectionRouter.writeProjection]] layout: keys ++ cnt ++
    * sum/min/max per measure), so a registered [[ProjectionRouter]]
    * serves aggregate queries over the base path from partials that are
    * fresh as of the last batch. Merging partials is exact for
    * count/sum-of-integer/min/max (sum cnt, sum sums, min mins, max
    * maxes); the projection holds one row per live key combination, so
    * the per-batch merge cost is O(|projection| + batch), never
    * O(history raw). Replay-safe via the same commit markers as the
    * other sinks (a replayed batch would double-merge its partials).
    */
  def projectionSink(df: DataFrame, baseDir: String, projDir: String,
                     checkpoint: String, keys: Seq[String],
                     measures: Seq[String]): DataStreamWriter[Row] =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        projectionBatch(batch, baseDir, projDir, keys, measures, batchId)
      }

  /** One [[projectionSink]] micro-batch, replay-safe at EVERY crash
    * point (package-private so the spec can drive crash windows
    * directly):
    *
    *  1. base append is IDEMPOTENT — the batch materializes beside the
    *     store, then its files move in under deterministic
    *     `batch<id>-<i>` names, a replay clearing its own prefix first;
    *     a plain `mode("append")` writes fresh UUID part files, so a
    *     crash between append and marker would double the batch's raw
    *     rows while the projection merge counted them once;
    *  2. the merge commit point is the atomic tmp→projDir rename, and a
    *     `_merged_<id>` tag file INSIDE the projection rides that
    *     rename — a replay that finds the tag skips the merge instead
    *     of folding the same partials twice;
    *  3. the batch marker commits last, making the replayed batch a
    *     full no-op.
    */
  private[graft] def projectionBatch(batch: DataFrame, baseDir: String,
                                     projDir: String, keys: Seq[String],
                                     measures: Seq[String],
                                     batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (alreadyCommitted(spark, baseDir, batchId)) return
    val hc = spark.sparkContext.hadoopConfiguration
    val proj = new org.apache.hadoop.fs.Path(projDir)
    val tmp = new org.apache.hadoop.fs.Path(projDir + ".tmp")
    val fs = proj.getFileSystem(hc)
    // crash recovery for the tagged swap (torn tmp writes, half-deleted
    // live dirs): promote a tagged tmp, drop an untagged one
    recoverSwap(fs, proj, tmp)
    // (1) idempotent base append
    idempotentAppend(batch, baseDir, batchId)
    // (2) merge partials — unless this batch's tag says it already did
    val tag = s"_merged_$batchId"
    if (!fs.exists(new org.apache.hadoop.fs.Path(proj, tag))) {
      val partials = batch.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("cnt"),
             measures.flatMap(m => Seq(
               sum(col(m)).as(s"sum_$m"),
               min(col(m)).as(s"min_$m"),
               max(col(m)).as(s"max_$m"),
               count(col(m)).as(s"nn_$m"))): _*)
      val merged =
        (try spark.read.parquet(projDir).unionByName(partials)
         catch {
           case e: org.apache.spark.sql.AnalysisException
               if e.getCondition == "PATH_NOT_FOUND" ||
                  e.getCondition == "UNABLE_TO_INFER_SCHEMA" =>
             partials
         })
          .groupBy(keys.map(col): _*)
          .agg(sum(col("cnt")).as("cnt"),
               measures.flatMap(m => Seq(
                 sum(col(s"sum_$m")).as(s"sum_$m"),
                 min(col(s"min_$m")).as(s"min_$m"),
                 max(col(s"max_$m")).as(s"max_$m"),
                 sum(col(s"nn_$m")).as(s"nn_$m"))): _*)
      // never overwrite the only copy in place: write the merged
      // state BESIDE it (tag included), then swap — a crash leaves
      // either the old projection or the promoted new one, never a
      // half-deleted dir
      merged.write.mode("overwrite").parquet(tmp.toString)
      fs.create(new org.apache.hadoop.fs.Path(tmp, tag), true).close()
      if (fs.exists(proj)) fs.delete(proj, true)
      fs.rename(tmp, proj)
    }
    // (3)
    markCommitted(spark, baseDir, batchId)
  }

  /** Read the current state maintained by [[upsertSink]] (hides the
    * internal bucketing column).
    */
  def readUpsertState(spark: org.apache.spark.sql.SparkSession,
                      stateDir: String): DataFrame =
    spark.read.parquet(stateDir).drop("__bucket")

  /** Stream-static enrichment join: the continuous form of the
    * dictionary/dimension join — each micro-batch equi-joins the static
    * side, which is explicitly broadcast so the stream side never
    * shuffles and no stream state accumulates (unlike stream-stream
    * joins, no watermark needed). At scale the dimension is re-read per
    * batch, picking up slowly-changing updates for free.
    */
  def enrich(stream: DataFrame, dim: DataFrame,
             keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys)

  /** T3: tumbling-window aggregate (the `toStartOf*` bucketing idiom over
    * kafka_time, `README.md:228`). Groups by the `window()` struct itself —
    * extracting `.start` inside the groupBy breaks event-time/watermark
    * tracking on streaming frames.
    */
  def tumblingCounts(df: DataFrame, ts: Column, width: String): DataFrame =
    df.groupBy(window(ts, width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w").getField("start").as("w_start"), col("event_type"),
              col("n"))

  /** T4: sliding-window aggregate. */
  def slidingCounts(df: DataFrame, ts: Column, width: String,
                    slide: String): DataFrame =
    df.groupBy(window(ts, width, slide).as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w").getField("start").as("w_start"), col("n"))

  /** T5: session windows (30-min-gap sessionization). */
  def sessionStats(df: DataFrame, ts: Column, gap: String): DataFrame =
    df.groupBy(session_window(ts, gap), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("s_start"),
              col("n"), col("sum_value"))

  /** T6: watermarked tumbling counts — late rows beyond `lateness` are
    * dropped (the explicit version of what the reference's at-least-once
    * Kafka pipeline silently tolerates).
    */
  def watermarkedTumblingCounts(df: DataFrame, tsCol: String, width: String,
                                lateness: String): DataFrame =
    tumblingCounts(df.withWatermark(tsCol, lateness), col(tsCol), width)

  /** T4 under a watermark — the streaming-executable form of
    * [[slidingCounts]] (append mode needs the watermark to finalize
    * windows; per-window state is bounded by lateness/slide).
    */
  def watermarkedSlidingCounts(df: DataFrame, tsCol: String, width: String,
                               slide: String, lateness: String): DataFrame =
    slidingCounts(df.withWatermark(tsCol, lateness), col(tsCol), width,
                  slide)

  /** T5 under a watermark: true streaming sessionization —
    * `session_window` keeps per-(user, open-session) state across
    * micro-batches and MERGES sessions when a later batch's row lands
    * inside the gap of an open one (the cross-batch semantics the
    * batch [[sessionStats]] gets for free from a global sort). The
    * summed value arrives pre-integerized (`value_e4` on the floor-e4
    * grid) so the cross-batch merge order can never move a result
    * bit — long addition is exact and associative, double addition is
    * not. Append mode emits a session only once its gap has closed
    * under the watermark.
    */
  def watermarkedSessionStats(df: DataFrame, tsCol: String, gap: String,
                              lateness: String): DataFrame =
    df.withWatermark(tsCol, lateness)
      .groupBy(session_window(col(tsCol), gap), col("user_id"))
      .agg(count(lit(1)).as("n"), sum("value_e4").as("sum_value_e4"))
      .select(col("user_id"), col("session_window.start").as("s_start"),
              col("n"), col("sum_value_e4"))

  /** T7+L1: continuous exact dedup against the FULL corpus history — each
    * micro-batch keeps only rows whose content hash has never been seen,
    * appends them to `outDir`, and records their hashes in a seen-store.
    * The store is per-batch hive partitions with hash-bucket
    * sub-partitions (`batch=<id>/__bucket=<pmod(hash,numBuckets)>`): a
    * batch partition-prunes its candidate read to the buckets it
    * touches and writes only novel hashes under its OWN partition, so
    * per-batch cost is O(touched buckets), no rewrite ever — the
    * incremental form of `q_dedup_exact` that a standing 100 TB corpus
    * needs (new shards dedup against years of history without
    * rescanning it).
    *
    * Replay safety, effectively-once on BOTH legs: the candidate read
    * EXCLUDES the batch's own store partition, so a replay always
    * anti-joins against exactly the pre-batch history and recomputes
    * the same novel set regardless of where the crashed attempt died;
    * the outDir append is an [[idempotentAppend]] (deterministic file
    * names, replay overwrites itself); the store write is an overwrite
    * of the batch's own partition dir. The marker commits last.
    *
    * `compactEvery` > 0 folds store hygiene into the lifecycle: at the
    * START of every N-th batch, all prior partitions consolidate into
    * one merged `batch=-1` history partition (still bucket
    * sub-partitioned) through the tagged tmp→rename swap
    * ([[recoverSwap]] promotes a complete tmp, discards a torn one).
    * Without compaction, O(10⁴) batches leave thousands of small files
    * per bucket and the candidate-lookup read amplifies on listing +
    * task scheduling. Running inside foreachBatch means the single
    * writer is quiesced by construction; content is identical
    * before/after, so a crash mid-compaction at worst re-runs it.
    */
  def dedupAgainstHistorySink(df: DataFrame, contentCol: String,
                              outDir: String, storeDir: String,
                              checkpoint: String,
                              numBuckets: Int = 16,
                              compactEvery: Int = 0): DataStreamWriter[Row] =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        dedupHistoryBatch(batch, contentCol, outDir, storeDir, numBuckets,
                          compactEvery, batchId)
      }

  /** One [[dedupAgainstHistorySink]] micro-batch (package-private so
    * the crash-injection spec can drive every FS boundary directly).
    */
  private[graft] def dedupHistoryBatch(batch: DataFrame,
                                       contentCol: String, outDir: String,
                                       storeDir: String, numBuckets: Int,
                                       compactEvery: Int,
                                       batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (alreadyCommitted(spark, outDir, batchId)) return
    val store = new org.apache.hadoop.fs.Path(storeDir)
    val tmp = new org.apache.hadoop.fs.Path(storeDir + ".tmp")
    val fs = store.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash recovery for the compaction swap: tagged tmp wins over any
    // (possibly half-deleted) live dir; untagged torn write is dropped
    recoverSwap(fs, store, tmp)
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0 &&
        fs.exists(store)) {
      try {
        val merged = spark.read.parquet(storeDir)
          .filter(col("batch") =!= batchId) // a crashed attempt's leftover
          .select("__h", "__bucket")
          .repartition(col("__bucket")) // one file per bucket post-fold
          .localCheckpoint() // sever lineage: we replace the source below
        if (fs.exists(tmp)) fs.delete(tmp, true)
        merged.write.mode("overwrite").partitionBy("__bucket")
          .parquet(s"$storeDir.tmp/batch=-1")
        fs.create(new org.apache.hadoop.fs.Path(
          tmp, s"_merged_compact_$batchId"), true).close()
        fs.delete(store, true)
        fs.rename(tmp, store)
      } catch {
        // a store of only empty partition dirs has no readable schema —
        // nothing to compact
        case _: org.apache.spark.sql.AnalysisException => ()
      }
    }
    val hashed = batch
      .withColumn("__h", xxhash64(col(contentCol)))
      .withColumn("__bucket",
                  pmod(col("__h"), lit(numBuckets)).cast("int"))
      // first occurrence within the batch wins
      .dropDuplicates("__h")
    val touched = hashed.select("__bucket").distinct()
      .collect().map(_.getInt(0)).toSeq
    val seen =
      (if (touched.isEmpty || !fs.exists(store))
         spark.range(0).select(col("id").as("__h"))
       else
         try spark.read.parquet(storeDir)
           .filter(col("batch") =!= batchId) // pre-batch history only
           .filter(col("__bucket").isin(touched: _*)) // partition-pruned
           .select("__h")
         catch {
           // only empty partition dirs → no schema → no history
           case _: org.apache.spark.sql.AnalysisException =>
             spark.range(0).select(col("id").as("__h"))
         })
    val novel = hashed
      .join(seen, Seq("__h"), "left_anti")
      .localCheckpoint() // two writes below; mine the batch once
    // outDir BEFORE store: with the reverse order a crash between the
    // two would make the replayed anti-join drop the rows → data loss.
    // (The own-partition exclusion above makes the replayed novel set
    // identical either way; the ordering is defense in depth.)
    idempotentAppend(novel.drop("__h", "__bucket"), outDir, batchId)
    novel.select(col("__h"), col("__bucket"))
      .write.mode("overwrite").partitionBy("__bucket")
      .parquet(s"$storeDir/batch=$batchId")
    markCommitted(spark, outDir, batchId)
  }

  /** Streaming ExactSubstr coverage sink: every micro-batch of documents
    * is scored against the accumulated window-hash store — history PLUS
    * the batch itself, the [[LlmOps.exactSubstrIncremental]] rule — and
    * its per-doc coverage rows append to `outDir`; the batch's window
    * counts then enter the store under a `batch=<id>` hive partition
    * (with `hb` sub-partitions pruning history lookups).
    *
    * Replay safety WITHOUT double counting: the store write is an
    * OVERWRITE of the batch's own partition dir (idempotent on replay),
    * and the scoring read EXCLUDES the batch's own partition — so a
    * replay that crashed after the store write still scores against
    * exactly the pre-batch history — and therefore recomputes the SAME
    * coverage rows, which the [[idempotentAppend]] outDir leg
    * overwrites in place (effectively-once); the batch marker commits
    * last and makes a fully committed replay a no-op.
    *
    * `compactEvery` > 0: at the START of every Nth batch, all prior
    * partitions consolidate into one merged `batch=-1` history partition
    * through a tmp→rename swap (crash recovery promotes a complete tmp
    * on the next batch — the projectionSink discipline). Compacting
    * before the batch's own write keeps the no-double-count invariant:
    * a crashed attempt's leftover own partition is explicitly excluded
    * from the consolidation, then rewritten by this attempt.
    */
  def substrCoverageSink(df: DataFrame, idCol: String, textCol: String,
                         outDir: String, storeDir: String,
                         checkpoint: String, w: Int, stride: Int = 1,
                         numBuckets: Int = 16,
                         compactEvery: Int = 0): DataStreamWriter[Row] =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        substrCoverageBatch(batch, idCol, textCol, outDir, storeDir, w,
                            stride, numBuckets, compactEvery, batchId)
      }

  /** One [[substrCoverageSink]] micro-batch (package-private so the spec
    * can drive crash windows directly).
    */
  private[graft] def substrCoverageBatch(batch: DataFrame, idCol: String,
                                         textCol: String, outDir: String,
                                         storeDir: String, w: Int,
                                         stride: Int, numBuckets: Int,
                                         compactEvery: Int,
                                         batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (alreadyCommitted(spark, outDir, batchId)) return
    val store = new org.apache.hadoop.fs.Path(storeDir)
    val tmp = new org.apache.hadoop.fs.Path(storeDir + ".tmp")
    val fs = store.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash recovery for the compaction swap: promote a TAGGED tmp even
    // over a surviving (possibly half-deleted) live dir; drop an
    // untagged torn write
    recoverSwap(fs, store, tmp)
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0 &&
        fs.exists(store)) {
      try {
        val merged = spark.read.parquet(storeDir)
          .filter(col("batch") =!= batchId) // a crashed attempt's leftover
          .groupBy("h").agg(sum(col("n")).as("n"))
          .withColumn("hb", pmod(col("h"), lit(numBuckets)).cast("int"))
          .localCheckpoint() // sever lineage: we replace the source below
        if (fs.exists(tmp)) fs.delete(tmp, true)
        merged.write.mode("overwrite").partitionBy("hb")
          .parquet(s"${storeDir}.tmp/batch=-1")
        fs.create(new org.apache.hadoop.fs.Path(
          tmp, s"_merged_compact_$batchId"), true).close()
        fs.delete(store, true)
        fs.rename(tmp, store)
      } catch {
        // a store of only empty partition dirs has no readable schema —
        // nothing to compact
        case _: org.apache.spark.sql.AnalysisException => ()
      }
    }
    val sh = LlmOps.substrShingles(batch, idCol, textCol, w, stride)
      .localCheckpoint() // reused: counts + dup marking
    val counts = sh.groupBy("h").agg(count(lit(1)).as("n"))
      .localCheckpoint() // reused: history join + store write
    val touchedHb = counts
      .select(pmod(col("h"), lit(numBuckets)).cast("int").as("hb"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val storeSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("h",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.LongType)))
    val hist =
      (if (touchedHb.isEmpty || !fs.exists(store))
         spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
                               storeSchema)
       else
         (try spark.read.parquet(storeDir)
            .filter(col("batch") =!= batchId) // pre-batch history only
            .filter(col("hb").isin(touchedHb: _*)) // partition-pruned
            .select("h", "n")
          catch {
            // only empty partition dirs → no schema → no history
            case _: org.apache.spark.sql.AnalysisException =>
              spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
                                    storeSchema)
          }))
        .groupBy("h").agg(sum(col("n")).as("n_hist"))
    val dupHashes = counts.join(hist, Seq("h"), "left")
      .filter(coalesce(col("n_hist"), lit(0L)) + col("n") > 1)
      .select("h")
    val cov = LlmOps.spanCoverage(
        sh.join(dupHashes, "h").select(col("doc"), col("pos")), w)
      .withColumnRenamed("doc", idCol)
      .localCheckpoint() // materialize BEFORE any store mutation
    // deterministic across replays (the store read excluded this
    // batch's own partition), so the idempotent append upgrades the
    // outDir leg from at-least-once to effectively-once
    idempotentAppend(cov, outDir, batchId)
    counts.withColumn("hb", pmod(col("h"), lit(numBuckets)).cast("int"))
      .write.mode("overwrite").partitionBy("hb")
      .parquet(s"$storeDir/batch=$batchId")
    markCommitted(spark, outDir, batchId)
  }

  /** Streaming rolling z-score anomaly alerts — the incremental form of
    * [[Analytics.rollingZscoreFlags]]: each arriving row is tested
    * against the trailing `lookback` rows of its own key's history
    * across ALL prior batches, using the same exact-integer |z| > sigma
    * predicate (so incremental flags equal the one-shot batch run under
    * ordered arrival — spec-pinned). The history store is append-only
    * per-batch hive dirs (`batch=N/__bucket=B`, the
    * [[substrCoverageBatch]] discipline): a batch reads only its keys'
    * hash buckets, excludes its own partition (crash-replay sees
    * pre-batch history), and in-lifecycle compaction folds the store to
    * each key's latest `lookback` rows — the bound that makes state
    * O(keys × lookback), never O(stream). Alerts reach `outDir` through
    * [[idempotentAppend]] (replay recomputes the same flags against the
    * unchanged pre-batch history and overwrites its own files —
    * effectively-once, marker-gated).
    */
  def zscoreAlertSink(df: DataFrame, outDir: String, storeDir: String,
                      checkpoint: String, keyCol: String, tsCol: String,
                      tieCol: String, valCol: String, lookback: Int = 100,
                      minN: Int = 30, sigma: Int = 3, numBuckets: Int = 16,
                      compactEvery: Int = 0): DataStreamWriter[Row] =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        zscoreAlertBatch(batch, outDir, storeDir, keyCol, tsCol, tieCol,
                         valCol, lookback, minN, sigma, numBuckets,
                         compactEvery, batchId)
      }

  /** One [[zscoreAlertSink]] micro-batch (package-private so the spec can
    * drive crash windows directly).
    */
  private[graft] def zscoreAlertBatch(batch: DataFrame, outDir: String,
                                      storeDir: String, keyCol: String,
                                      tsCol: String, tieCol: String,
                                      valCol: String, lookback: Int,
                                      minN: Int, sigma: Int,
                                      numBuckets: Int, compactEvery: Int,
                                      batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (alreadyCommitted(spark, outDir, batchId)) return
    val store = new org.apache.hadoop.fs.Path(storeDir)
    val tmp = new org.apache.hadoop.fs.Path(storeDir + ".tmp")
    val fs = store.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash recovery for the compaction swap: tagged tmp wins over any
    // (possibly half-deleted) live dir; untagged torn write is dropped
    recoverSwap(fs, store, tmp)
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0 &&
        fs.exists(store)) {
      try {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keyCol)
          .orderBy(col(tsCol).desc, col(tieCol).desc)
        val folded = spark.read.parquet(storeDir)
          .filter(col("batch") =!= batchId) // a crashed attempt's leftover
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= lookback) // each key's latest tail only
          // drop the hive partition column read back as data — writing
          // it under batch=-1 would shadow the new partition dir value
          .drop("__rn", "batch")
          .localCheckpoint() // sever lineage: we replace the source below
        if (fs.exists(tmp)) fs.delete(tmp, true)
        folded.write.mode("overwrite").partitionBy("__bucket")
          .parquet(s"${storeDir}.tmp/batch=-1")
        fs.create(new org.apache.hadoop.fs.Path(
          tmp, s"_merged_compact_$batchId"), true).close()
        fs.delete(store, true)
        fs.rename(tmp, store)
      } catch {
        // a store of only empty partition dirs has no readable schema
        case _: org.apache.spark.sql.AnalysisException => ()
      }
    }
    val b = batch
      .select(col(keyCol), col(tsCol), col(tieCol), col(valCol))
      .withColumn("__bucket",
        pmod(xxhash64(col(keyCol)), lit(numBuckets)).cast("int"))
      .localCheckpoint() // reused: flags + store write
    val touched = b.select("__bucket").distinct()
      .collect().map(_.getInt(0)).toSeq
    val hist =
      (if (touched.isEmpty || !fs.exists(store))
         spark.createDataFrame(spark.sparkContext.emptyRDD[Row], b.schema)
       else
         (try spark.read.parquet(storeDir)
            .filter(col("batch") =!= batchId) // pre-batch history only
            .filter(col("__bucket").isin(touched: _*)) // pruned read
            .select(b.columns.map(col): _*)
          catch {
            // only empty partition dirs → no schema → no history
            case _: org.apache.spark.sql.AnalysisException =>
              spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
                                    b.schema)
          }))
    val flags = Analytics.rollingZscoreFlags(
        hist.withColumn("__isNew", lit(false))
          .unionByName(b.withColumn("__isNew", lit(true))),
        keyCol, tsCol, tieCol, valCol, lookback, minN, sigma)
      .filter(col("__isNew"))
      .select(col(keyCol), col(tsCol), col(tieCol), col(valCol),
              col("checked"), col("anomaly"))
      .localCheckpoint() // materialize BEFORE any store mutation
    // deterministic across replays (history read excluded this batch's
    // own partition) → idempotent append = effectively-once alerts
    idempotentAppend(flags, outDir, batchId)
    b.write.mode("overwrite").partitionBy("__bucket")
      .parquet(s"$storeDir/batch=$batchId")
    markCommitted(spark, outDir, batchId)
  }

  /** T1+A7: incrementally-maintained aggregate table — the reference's MV
    * writing into an aggregating target (SummingMergeTree's role), made
    * deterministic: each micro-batch partially aggregates ITSELF (count +
    * sum are merge-able partials), reads only the touched
    * `partitionCol` partitions of the state, merges, and
    * dynamic-overwrites just those partitions. Per-batch cost follows the
    * batch's partition footprint (a day of late data re-aggregates one
    * day, never the table); the full history is never rescanned.
    */
  /** Streaming maintenance of the exact integer SCATTER state behind
    * [[LlmOps.pcaTopComponent]] — the embedding-drift monitor shape:
    * every micro-batch of vectors folds its own (n, per-dim sums,
    * pairwise power sums) partials into a store that stays O(dims²)
    * rows — 64·64 + 64 + 1 — REGARDLESS of history, because integer
    * partials merge by addition (exact and associative). Serving
    * ([[pcaFromScatterState]]) runs the fixed-point power iteration
    * over the store with NO corpus pass, fresh as of the last batch,
    * and — spec-pinned — equals the one-shot batch computation on the
    * accumulated corpus bit-for-bit. Replay-safe at every crash point
    * (the [[projectionBatch]] discipline): the merge commits via an
    * atomic tmp→dir rename carrying a `_merged_<id>` tag, the batch
    * marker (living OUTSIDE the swapped dir) commits last, and a
    * half-finished swap is promoted on the next entry.
    */
  def scatterSink(df: DataFrame, stateDir: String,
                  checkpoint: String): DataStreamWriter[Row] =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        scatterBatch(batch, stateDir, batchId)
      }

  private[graft] def scatterBatch(batch: DataFrame, stateDir: String,
                                  batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (alreadyCommitted(spark, stateDir, batchId)) return
    val hc = spark.sparkContext.hadoopConfiguration
    val state = new org.apache.hadoop.fs.Path(s"$stateDir/scatter")
    val tmp = new org.apache.hadoop.fs.Path(s"$stateDir/scatter.tmp")
    val fs = state.getFileSystem(hc)
    // crash recovery for the tagged swap below (incl. torn first-batch
    // writes and half-deleted live dirs)
    recoverSwap(fs, state, tmp)
    val tag = s"_merged_$batchId"
    if (!fs.exists(new org.apache.hadoop.fs.Path(state, tag))) {
      val partial = LlmOps.scatterPartials(batch)
      val merged =
        (try spark.read.parquet(state.toString).unionByName(partial)
         catch {
           case e: org.apache.spark.sql.AnalysisException
               if e.getCondition == "PATH_NOT_FOUND" ||
                  e.getCondition == "UNABLE_TO_INFER_SCHEMA" =>
             partial
         })
          .groupBy("kind", "i", "j").agg(sum("v").as("v"))
          .coalesce(1) // O(dims²) rows: one file, not 32 shards
      merged.write.mode("overwrite").parquet(tmp.toString)
      fs.create(new org.apache.hadoop.fs.Path(tmp, tag), true).close()
      if (fs.exists(state)) fs.delete(state, true)
      fs.rename(tmp, state)
    }
    markCommitted(spark, stateDir, batchId)
  }

  /** Top principal component served from the [[scatterSink]] store —
    * the O(dims²) read + driver-side iteration, no corpus pass.
    */
  /** Read-only crash tolerance for swap-disciplined state dirs: if the
    * tmp sibling exists AND carries a `_merged_*` completion tag, SERVE
    * from the tmp — it is complete by construction and strictly as new
    * as the live dir, which a crash mid-`fs.delete(live)` may have left
    * HALF-DELETED (so "live exists" proves nothing). An untagged tmp is
    * a torn write: serve the live path (on a first-batch torn write
    * neither dir holds complete state and the read correctly fails). No
    * mutation here: the owning sink's entry recovery performs the
    * actual promote. This NARROWS the failure window rather than
    * closing it: the path choice races the owner's promote (a
    * concurrent rename between this check and the read's file listing
    * can still surface PATH_NOT_FOUND — retry on the live path), but a
    * serving call inside a QUIESCED crash window, the common case, now
    * succeeds instead of failing until the next batch.
    */
  private def serveDir(spark: SparkSession, live: String,
                       tmp: String): String = {
    val t = new org.apache.hadoop.fs.Path(tmp)
    val fs = t.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (hasMergedTag(fs, t)) tmp else live
  }

  def pcaFromScatterState(spark: SparkSession, stateDir: String,
                          iters: Int): DataFrame =
    LlmOps.pcaFromPartials(
      spark.read.parquet(serveDir(spark, s"$stateDir/scatter",
                                  s"$stateDir/scatter.tmp")),
      iters)

  /** Streaming MINI-BATCH k-means (Sculley 2010's web-scale variant in
    * the exact-integer discipline) — online clustering for embedding
    * drift: each micro-batch assigns its vectors to the stored
    * centroids (broadcast, exact BIGINT distances, lower-cid
    * tie-break) and folds them into the per-cluster RUNNING MEAN,
    * c' = ⌊(c·n + Σ_batch x) / (n + n_batch)⌋ per dimension in
    * sign-split integer division — c·n stays exact because c is a
    * floored mean on the e4 grid (|c| ≤ 10⁴) and n counts vectors, so
    * the product is bounded by 10⁴·n. The store is O(k·dims) rows
    * regardless of history; the FIRST batch Forgy-seeds it (md5-
    * smallest ids, n = 0, so the first merge lands exactly on the
    * batch means). Startup batches with fewer than k live vectors
    * STASH their coordinates in `pending/batch=<id>` partitions
    * (idempotent overwrite) and fold into the first successful seed —
    * no pre-seed vector is ever dropped from the statistics. Crash
    * discipline = [[scatterBatch]]'s: tmp→dir swap
    * with a `_merged_<id>` tag, marker outside the swapped dir.
    * Serve/classify with [[assignWithCentroidState]].
    */
  def miniBatchKmeansSink(df: DataFrame, stateDir: String,
                          checkpoint: String,
                          k: Int): DataStreamWriter[Row] =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        kmeansBatch(batch, stateDir, k, batchId)
      }

  private[graft] def kmeansBatch(batch: DataFrame, stateDir: String,
                                 k: Int, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (alreadyCommitted(spark, stateDir, batchId)) return
    val hc = spark.sparkContext.hadoopConfiguration
    val state = new org.apache.hadoop.fs.Path(s"$stateDir/centroids")
    val tmp = new org.apache.hadoop.fs.Path(s"$stateDir/centroids.tmp")
    val fs = state.getFileSystem(hc)
    // tagged-swap recovery: on the FIRST seeding batch the live dir has
    // never existed, so a torn tmp write must be detected by the tag,
    // not inferred from the live dir being absent
    recoverSwap(fs, state, tmp)
    val tag = s"_merged_$batchId"
    if (!fs.exists(new org.apache.hadoop.fs.Path(state, tag))) {
      val centsOpt =
        try Some(spark.read.parquet(state.toString).localCheckpoint())
        catch {
          case e: org.apache.spark.sql.AnalysisException
              if e.getCondition == "PATH_NOT_FOUND" ||
                 e.getCondition == "UNABLE_TO_INFER_SCHEMA" => None
        }
      val xb = LlmOps.intCoords(batch).localCheckpoint()
      // until the store seeds, sub-k batches STASH their coordinates in
      // a pending dir (per-batch partition overwrite = replay-idempotent)
      // instead of being dropped — once seeding succeeds the pending
      // vectors fold into the very first merge, so no pre-seed vector is
      // ever excluded from the centroid statistics
      val pending = new org.apache.hadoop.fs.Path(s"$stateDir/pending")
      val x = (if (centsOpt.isEmpty && fs.exists(pending))
          (try spark.read.parquet(pending.toString)
             .filter(col("batch") =!= batchId) // a crashed attempt's own stash
             .select("vec_id", "i", "x")
             .unionByName(xb)
           catch {
             // only empty partition dirs → no schema → no pending
             case _: org.apache.spark.sql.AnalysisException => xb
           })
        else xb).localCheckpoint()
      // vectors that actually SURVIVE coordinate extraction: a vec_id
      // whose embedding is null/empty contributes zero coordinate
      // rows, so counting raw batch ids would overstate seedability
      // (and picking such an id as a seed would leave its cid with no
      // centroid rows — the <k lock-in through the back door)
      val live = x.select("vec_id").distinct().localCheckpoint()
      if (centsOpt.isEmpty && live.count() < k) {
        // no store yet and batch + pending can't seed k distinct
        // centroids (an empty startup micro-batch is the common case —
        // e.g. Trigger.AvailableNow over a source with nothing
        // buffered). Seeding would commit a <k-row store that is then
        // PERMANENT — every later batch only folds into existing cids,
        // so the sink would silently never reach k clusters. Stash this
        // batch's own coordinates and retry seeding on the next batch.
        if (!xb.isEmpty)
          xb.write.mode("overwrite")
            .parquet(s"$stateDir/pending/batch=$batchId")
        markCommitted(spark, stateDir, batchId)
        return
      }
      val cents = centsOpt.getOrElse {
        // first adequate batch: Forgy-seed from the LIVE vectors
        // (distinct, coordinate-bearing) — n = 0 so the merge below
        // resolves to the exact batch means
        x.join(broadcast(LlmOps.forgySeeds(live, k)), "vec_id")
          .select(col("cid"), col("i"), col("x").as("c"),
                  lit(0L).as("n"))
      }
      val sums = LlmOps
        .assignToCentroids(x, cents.select("cid", "i", "c"))
        .join(x, "vec_id")
        .groupBy(col("cluster").as("cid"), col("i"))
        .agg(sum("x").as("bs"), count(lit(1)).as("bn"))
      val merged = cents
        .join(sums, Seq("cid", "i"), "left")
        .select(col("cid"), col("i"), expr(
          "CASE WHEN bn IS NULL THEN c " +
          "WHEN c * n + bs < 0 THEN -((-(c * n + bs)) div (n + bn)) " +
          "ELSE (c * n + bs) div (n + bn) END").as("c"),
          (col("n") + coalesce(col("bn"), lit(0L))).as("n"))
        .coalesce(1) // O(k·dims) rows: one file
      merged.write.mode("overwrite").parquet(tmp.toString)
      fs.create(new org.apache.hadoop.fs.Path(tmp, tag), true).close()
      if (fs.exists(state)) fs.delete(state, true)
      fs.rename(tmp, state)
    }
    // once a centroid store exists, any pending stash has been folded
    // into it (the seeding merge unions pending coords) — clear it here,
    // AFTER the swap, so a crash-replay that skips the merge block still
    // drops the stale stash
    val pendingDone = new org.apache.hadoop.fs.Path(s"$stateDir/pending")
    if (fs.exists(state) && fs.exists(pendingDone))
      fs.delete(pendingDone, true)
    markCommitted(spark, stateDir, batchId)
  }

  /** Classify a batch of vectors against the [[miniBatchKmeansSink]]
    * store — the serving read: broadcast centroids, no shuffle beyond
    * the per-vector reduction.
    */
  def assignWithCentroidState(df: DataFrame, spark: SparkSession,
                              stateDir: String): DataFrame =
    LlmOps.assignToCentroids(
      LlmOps.intCoords(df),
      spark.read.parquet(serveDir(spark, s"$stateDir/centroids",
                                  s"$stateDir/centroids.tmp"))
        .select("cid", "i", "c"))

  /** Incrementally-maintained INVERTED INDEX + BM25 statistics — the
    * streaming form of the lexical-retrieval state behind
    * [[LlmOps.bm25Scores]]: a growing corpus indexes each batch ONCE
    * and the standing store serves lexical queries with no history
    * rescan. Both legs are IDEMPOTENT per-batch partition overwrites
    * (the [[substrCoverageBatch]] discipline) — a crash anywhere
    * inside the batch replays to identical state, so tf/df/n_docs can
    * never inflate (a plain append would double-count postings when a
    * crash lands between the postings write and the marker):
    *
    *  - `postings/batch=<id>/`: (token, doc, dl, tf) hive-partitioned
    *    by `tokb = pmod(xxhash64(token), numBuckets)` under the
    *    batch's OWN partition — a query's terms prune the read to
    *    their buckets (tokb pruning works below the batch level), and
    *    a replay overwrite-replaces exactly this batch's contribution.
    *    dl rides denormalized on every posting so serving never joins
    *    a doc table.
    *  - `stats/batch=<id>/`: one (n_docs, sum_dl) partial row per
    *    batch (the batch id IS the partition) — integer partials
    *    merge by addition, so corpus-wide N and avgdl come from a
    *    tiny O(batches) scan.
    *
    * Serving ([[bm25FromIndexState]]) replays the EXACT batch scoring
    * arithmetic (same idf/tf saturation expression tree, same
    * floor(·10⁶) integerization), so the spec pins streaming-built ==
    * one-shot [[LlmOps.bm25Scores]] on the concatenated corpus,
    * bit-for-bit. `compactEvery` > 0: at the START of every Nth
    * batch, all prior posting partitions consolidate into one merged
    * `batch=-1` history partition (still tokb-sub-partitioned)
    * through a tmp→rename swap — crash recovery promotes a complete
    * tmp on the next batch, and an interrupted swap can never lose
    * token buckets the way an in-place overwrite could.
    */
  def invertedIndexSink(df: DataFrame, idCol: String, textCol: String,
                        stateDir: String, checkpoint: String,
                        numBuckets: Int = 16,
                        compactEvery: Int = 0): DataStreamWriter[Row] =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        invertedIndexBatch(batch, idCol, textCol, stateDir, numBuckets,
                           compactEvery, batchId)
      }

  private[graft] def invertedIndexBatch(batch: DataFrame, idCol: String,
                                        textCol: String, stateDir: String,
                                        numBuckets: Int, compactEvery: Int,
                                        batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (alreadyCommitted(spark, stateDir, batchId)) return
    val post = new org.apache.hadoop.fs.Path(s"$stateDir/postings")
    val tmp = new org.apache.hadoop.fs.Path(s"$stateDir/postings.tmp")
    val fs = post.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash recovery for the compaction swap below: a TAGGED tmp is the
    // complete compacted store and must be promoted even if (part of)
    // the live postings dir survived a torn delete — gating on
    // !exists(post) would rebuild from the partial store and silently
    // drop token buckets from every future BM25 score. An untagged tmp
    // is a torn compaction write (live store intact) — dropped.
    recoverSwap(fs, post, tmp)
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0 &&
        fs.exists(post)) {
      try {
        val merged = spark.read.parquet(post.toString)
          .filter(col("batch") =!= batchId) // a crashed attempt's leftover
          .select("doc", "dl", "token", "tf", "tokb")
          .repartition(col("tokb")) // one file per bucket after the fold
          .localCheckpoint() // sever lineage: we replace the source below
        if (fs.exists(tmp)) fs.delete(tmp, true)
        merged.write.mode("overwrite").partitionBy("tokb")
          .parquet(s"$stateDir/postings.tmp/batch=-1")
        // seal the tmp — only now does the swap prefer it over the live
        // dir ([[recoverSwap]] / [[serveDir]] both key on this tag)
        fs.create(new org.apache.hadoop.fs.Path(
          tmp, s"_merged_compact_$batchId"), true).close()
        fs.delete(post, true)
        fs.rename(tmp, post)
      } catch {
        // a store of only empty partition dirs has no readable schema —
        // nothing to compact
        case _: org.apache.spark.sql.AnalysisException => ()
      }
    }
    val toks = batch
      .select(col(idCol).as("doc"),
              LlmOps.tokens(col(textCol), normalize = true).as("toks"))
      .select(col("doc"), size(col("toks")).cast("long").as("dl"),
              col("toks"))
      .localCheckpoint() // read twice: postings + stats
    val statsRow = toks
      .agg(count(lit(1)).as("n_docs"),
           coalesce(sum("dl"), lit(0L)).as("sum_dl")).head()
    if (statsRow.getLong(0) == 0L) {
      // empty batch: nothing to index, and an empty partitioned append
      // would seed a parquet-less postings dir readers choke on
      markCommitted(spark, stateDir, batchId)
      return
    }
    toks.select(col("doc"), col("dl"), explode(col("toks")).as("token"))
      .groupBy("doc", "dl", "token")
      .agg(count(lit(1)).cast("long").as("tf"))
      .withColumn("tokb",
                  pmod(xxhash64(col("token")), lit(numBuckets)).cast("int"))
      .write.mode("overwrite").partitionBy("tokb")
      .parquet(s"$stateDir/postings/batch=$batchId")
    spark.createDataFrame(Seq((statsRow.getLong(0), statsRow.getLong(1))))
      .toDF("n_docs", "sum_dl")
      .coalesce(1) // one partial row: one file
      .write.mode("overwrite").parquet(s"$stateDir/stats/batch=$batchId")
    markCommitted(spark, stateDir, batchId)
  }

  /** BM25 over the [[invertedIndexSink]] store — query-time cost is
    * O(touched buckets + matching postings), never O(corpus): the
    * terms' hash buckets partition-prune the postings read, corpus
    * stats come from the tiny per-batch partial table, and the scoring
    * replays [[LlmOps.bm25Scores]]'s expression tree exactly
    * (including the floor(·10⁶) integer grid), so a streaming-built
    * index scores identically to a batch pass over the same corpus.
    * `numBuckets` must match the sink's.
    */
  def bm25FromIndexState(spark: SparkSession, stateDir: String,
                         terms: Seq[String], k1: Double = 1.2,
                         b: Double = 0.75,
                         numBuckets: Int = 16): DataFrame = {
    import spark.implicits._
    // the terms' buckets, via the SAME xxhash64 the sink used (a tiny
    // local job — replicating Spark's seed-42 xxhash in driver code
    // would be a second implementation to keep in sync)
    val touched = terms.toDF("token")
      .select(pmod(xxhash64(col("token")), lit(numBuckets)).cast("int"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val post = spark.read
      .parquet(serveDir(spark, s"$stateDir/postings",
                        s"$stateDir/postings.tmp"))
      .filter(col("tokb").isin(touched: _*)) // partition-pruned
      .filter(col("token").isin(terms: _*))
    val stats = spark.read.parquet(s"$stateDir/stats")
      .agg(sum("n_docs").cast("double").as("n_docs"),
           (sum("sum_dl").cast("double") /
             sum("n_docs").cast("double")).as("avgdl"))
    val dfreq = post.groupBy("token")
      .agg(countDistinct(col("doc")).cast("double").as("df"))
    post
      .select(col("doc"), col("dl").cast("double").as("dl"),
              col("token"), col("tf").cast("double").as("tf"))
      .join(broadcast(dfreq), "token")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("tscore",
        col("idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc")
      .agg(sum(expr("CAST(floor(tscore * 1000000.0) AS BIGINT)"))
             .as("bm25_e6"),
           count(lit(1)).as("n_terms"))
  }

  def incrementalAggSink(df: DataFrame, stateDir: String, checkpoint: String,
                         partitionCol: String, keyCols: Seq[String],
                         valueCol: String,
                         compactEvery: Int = 0): DataStreamWriter[Row] =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        incrementalAggBatch(batch, stateDir, partitionCol, keyCols,
                            valueCol, compactEvery, batchId)
      }

  /** One [[incrementalAggSink]] micro-batch (package-private so the
    * spec can drive crash windows directly). Replay-safe at every
    * crash point via [[mergeTouchedPartitions]].
    */
  private[graft] def incrementalAggBatch(batch: DataFrame, stateDir: String,
                                         partitionCol: String,
                                         keyCols: Seq[String],
                                         valueCol: String, compactEvery: Int,
                                         batchId: Long): Unit = {
    val spark = batch.sparkSession
    // recovery FIRST, unconditionally: a compaction crash in the
    // delete->rename window leaves the store (markers included — the
    // swap carries them) only under the sealed tmp, and a torn delete
    // can even leave a PARTIAL live dir whose surviving marker would
    // pass the check while the store itself is half gone — so promote/
    // discard the tmp before trusting any marker
    Sources.recoverCompactedDir(spark, stateDir)
    if (alreadyCommitted(spark, stateDir, batchId)) return
    val groupCols = (partitionCol +: keyCols).map(col)
    mergeTouchedPartitions(spark, stateDir, partitionCol, batchId) {
      val partial = batch.groupBy(groupCols: _*)
        .agg(count(lit(1)).as("n"), sum(valueCol).as("sum_value"))
      val touched = partial.select(partitionCol).distinct()
        .collect().map(_.get(0)).toSeq
      val current =
        try spark.read.parquet(stateDir)
          .filter(inTouched(col(partitionCol), touched))
        catch {
          // no state yet: dir absent, or holding only the hidden
          // _graft_commits markers (no parquet to infer from)
          case e: org.apache.spark.sql.AnalysisException
              if e.getCondition == "PATH_NOT_FOUND" ||
                 e.getCondition == "UNABLE_TO_INFER_SCHEMA" =>
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[Row], partial.schema)
        }
      current.unionByName(partial)
        .groupBy(groupCols: _*)
        .agg(sum("n").as("n"), sum("sum_value").as("sum_value"))
    }
    // same lifecycle hygiene as dedupAgainstHistorySink: the merge
    // re-materializes each touched partition every batch; every N-th
    // batch folds each partition back to one file (identical content,
    // single quiesced writer, crash-safe tmp swap)
    if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
      Sources.compactPartitionedDir(spark, stateDir, partitionCol)
  }

  /** [[incrementalAggSink]]'s distinct-count sibling — the
    * AggregatingMergeTree uniqState/uniqMerge analog: the maintained state
    * is a MERGEABLE Datasketches-HLL sketch per (partition, key), not a
    * number. Each micro-batch sketches ITSELF (`hll_sketch_agg`), reads
    * only the touched `partitionCol` partitions, merges via
    * `hll_union_agg`, and swaps just those partitions in through the
    * staged [[mergeTouchedPartitions]] discipline —
    * so a cross-batch duplicate visitor is never double-counted even
    * though no batch ever sees another batch's raw rows, and per-batch
    * cost is O(batch footprint × sketch), never O(history).
    * Read the table with [[distinctEstimates]].
    */
  def incrementalDistinctSink(df: DataFrame, stateDir: String,
                              checkpoint: String, partitionCol: String,
                              keyCols: Seq[String], distinctCol: String,
                              compactEvery: Int = 0): DataStreamWriter[Row] =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        incrementalDistinctBatch(batch, stateDir, partitionCol, keyCols,
                                 distinctCol, compactEvery, batchId)
      }

  /** One [[incrementalDistinctSink]] micro-batch (package-private so
    * the crash-injection spec can drive every FS boundary directly).
    */
  private[graft] def incrementalDistinctBatch(batch: DataFrame,
                                              stateDir: String,
                                              partitionCol: String,
                                              keyCols: Seq[String],
                                              distinctCol: String,
                                              compactEvery: Int,
                                              batchId: Long): Unit = {
    val spark = batch.sparkSession
    // recover BEFORE trusting the marker check: a compaction crash
    // strands the store (and its markers) under the tmp name
    Sources.recoverCompactedDir(spark, stateDir)
    if (alreadyCommitted(spark, stateDir, batchId)) return
    val groupCols = (partitionCol +: keyCols).map(col)
    mergeTouchedPartitions(spark, stateDir, partitionCol, batchId) {
      val partial = batch.groupBy(groupCols: _*)
        .agg(hll_sketch_agg(col(distinctCol)).as("sk"))
      val touched = partial.select(partitionCol).distinct()
        .collect().map(_.get(0)).toSeq
      val current =
        try spark.read.parquet(stateDir)
          .filter(inTouched(col(partitionCol), touched))
        catch {
          case e: org.apache.spark.sql.AnalysisException
              if e.getCondition == "PATH_NOT_FOUND" ||
                 e.getCondition == "UNABLE_TO_INFER_SCHEMA" =>
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[Row], partial.schema)
        }
      current.unionByName(partial)
        .groupBy(groupCols: _*)
        .agg(hll_union_agg(col("sk")).as("sk"))
    }
    if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
      Sources.compactPartitionedDir(spark, stateDir, partitionCol)
  }

  /** The read side of [[incrementalDistinctSink]]: per-key distinct-count
    * estimates from the stored sketches — O(state rows), raw events never
    * touched. */
  def distinctEstimates(spark: SparkSession, stateDir: String): DataFrame =
    spark.read
      .parquet(serveDir(spark, stateDir,
                        stateDir + Sources.CompactTmpSuffix))
      .withColumn("approx_distinct", hll_sketch_estimate(col("sk")))
      .drop("sk")

  /** Incrementally-maintained heavy hitters — the topKState/topKMerge
    * sibling of [[incrementalDistinctSink]]: the maintained state is a
    * mergeable ApproxTopK sketch per (partition, key). Each micro-batch
    * accumulates ITSELF, reads only the touched `partitionCol` partitions,
    * re-combines, and swaps just those partitions in (staged
    * [[mergeTouchedPartitions]] discipline) — item
    * counts keep accumulating across batches although no batch sees
    * another's raw rows, and per-batch cost is O(batch footprint ×
    * sketch), never O(history). Read with [[topKEstimates]].
    */
  def incrementalTopKSink(df: DataFrame, stateDir: String,
                          checkpoint: String, partitionCol: String,
                          keyCols: Seq[String], itemCol: String,
                          maxItemsTracked: Int = 1024,
                          compactEvery: Int = 0): DataStreamWriter[Row] =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // recover BEFORE trusting the marker check: a compaction crash
        // strands the store (and its markers) under the tmp name
        incrementalTopKBatch(batch, stateDir, partitionCol, keyCols,
                             itemCol, maxItemsTracked, compactEvery,
                             batchId)
      }

  /** One [[incrementalTopKSink]] micro-batch (package-private so the
    * crash-injection spec can drive every FS boundary directly).
    */
  private[graft] def incrementalTopKBatch(batch: DataFrame,
                                          stateDir: String,
                                          partitionCol: String,
                                          keyCols: Seq[String],
                                          itemCol: String,
                                          maxItemsTracked: Int,
                                          compactEvery: Int,
                                          batchId: Long): Unit = {
    val spark = batch.sparkSession
    // recover BEFORE trusting the marker check: a compaction crash
    // strands the store (and its markers) under the tmp name
    Sources.recoverCompactedDir(spark, stateDir)
    if (alreadyCommitted(spark, stateDir, batchId)) return
    val groupCols = (partitionCol +: keyCols).map(col)
    mergeTouchedPartitions(spark, stateDir, partitionCol, batchId) {
      val partial = batch.groupBy(groupCols: _*)
        .agg(expr(
            s"approx_top_k_accumulate($itemCol, $maxItemsTracked)")
          .as("st"))
      val touched = partial.select(partitionCol).distinct()
        .collect().map(_.get(0)).toSeq
      val current =
        try spark.read.parquet(stateDir)
          .filter(inTouched(col(partitionCol), touched))
        catch {
          case e: org.apache.spark.sql.AnalysisException
              if e.getCondition == "PATH_NOT_FOUND" ||
                 e.getCondition == "UNABLE_TO_INFER_SCHEMA" =>
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[Row], partial.schema)
        }
      current.unionByName(partial)
        .groupBy(groupCols: _*)
        .agg(expr(s"approx_top_k_combine(st, $maxItemsTracked)")
          .as("st"))
    }
    if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
      Sources.compactPartitionedDir(spark, stateDir, partitionCol)
  }

  /** Incrementally-maintained per-entity EMA — the streaming face of
    * [[Analytics.emaBucketed]], and the reason its affine decomposition
    * matters beyond hot-key safety: EMA with factor α folds a batch
    * onto any prior accumulator as `acc' = acc·(1-α)ⁿ + partial`, so
    * each micro-batch summarizes ITSELF per entity (one hash aggregate,
    * the batch's own sorted slice) and composes onto the stored value —
    * per-batch cost is O(batch + touched state), the event history is
    * never rescanned. State = one row per entity in hash-bucketed hive
    * partitions (pruned reads + the staged [[mergeTouchedPartitions]]
    * swap); replay-guarded by commit markers because
    * composition is NOT idempotent. Requires batches be time-ordered
    * per entity (an event stream consumed in order): an event older
    * than the stored accumulator cannot be folded retroactively.
    * Read with [[readEmaState]].
    */
  def incrementalEmaSink(df: DataFrame, stateDir: String, checkpoint: String,
                         keyCol: String, tsCol: String, tieCol: String,
                         valCol: String, alpha: Double,
                         numBuckets: Int = 16): DataStreamWriter[Row] =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        incrementalEmaBatch(batch, stateDir, keyCol, tsCol, tieCol,
                            valCol, alpha, numBuckets, batchId)
      }

  /** One [[incrementalEmaSink]] micro-batch (package-private so the
    * crash-injection spec can drive every FS boundary directly).
    */
  private[graft] def incrementalEmaBatch(batch: DataFrame,
                                         stateDir: String, keyCol: String,
                                         tsCol: String, tieCol: String,
                                         valCol: String, alpha: Double,
                                         numBuckets: Int,
                                         batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (alreadyCommitted(spark, stateDir, batchId)) return
    mergeTouchedPartitions(spark, stateDir, "__bucket", batchId) {
      val summaries = Analytics.emaBucketSummaries(
          batch, keyCol, tsCol, tieCol, valCol, alpha, _ => lit(0))
        .select(col(keyCol), col("__d"), col("__p"), col("__ps"))
        .withColumn("__bucket",
          pmod(xxhash64(col(keyCol)), lit(numBuckets)).cast("int"))
      val touched = summaries.select("__bucket").distinct()
        .collect().map(_.getInt(0)).toSeq
      val current =
        try spark.read.parquet(stateDir)
          .filter(col("__bucket").isin(touched: _*))
        catch {
          case e: org.apache.spark.sql.AnalysisException
              if e.getCondition == "PATH_NOT_FOUND" ||
                 e.getCondition == "UNABLE_TO_INFER_SCHEMA" =>
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[Row],
              org.apache.spark.sql.types.StructType(Seq(
                summaries.schema(keyCol),
                org.apache.spark.sql.types.StructField(
                  "ema", org.apache.spark.sql.types.DoubleType),
                org.apache.spark.sql.types.StructField(
                  "__bucket",
                  org.apache.spark.sql.types.IntegerType))))
        }
      current.withColumnRenamed("__bucket", "__bc")
        .join(summaries.withColumnRenamed("__bucket", "__bs"),
              Seq(keyCol), "full_outer")
        .select(col(keyCol),
                when(col("__d").isNull, col("ema"))     // untouched
                  .when(col("ema").isNull, col("__ps")) // first seen
                  .otherwise(col("ema") * col("__d") + col("__p"))
                  .as("ema"),
                coalesce(col("__bc"), col("__bs")).as("__bucket"))
    }
  }

  /** The read side of [[incrementalEmaSink]] (hides the bucketing
    * column). */
  def readEmaState(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(stateDir).drop("__bucket")

  /** The read side of [[incrementalTopKSink]]: per-key top-k items with
    * accumulated counts from the stored sketch states — O(state rows),
    * raw events never touched. */
  def topKEstimates(spark: SparkSession, stateDir: String,
                    k: Int): DataFrame = {
    val st = spark.read
      .parquet(serveDir(spark, stateDir,
                        stateDir + Sources.CompactTmpSuffix))
    val keep = st.columns.filterNot(_ == "st").map(col)
    st.select(keep :+
        explode(expr(s"approx_top_k_estimate(st, $k)")).as("e"): _*)
      .select(keep :+ col("e.item").as("item") :+
        col("e.count").as("approx_count"): _*)
  }

  /** T7: streaming dedup on the upsert key — ReplacingMergeTree's online
    * analog (state bounded by the watermark).
    */
  def streamingDedup(df: DataFrame, tsCol: String, lateness: String,
                     keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, lateness)
      .dropDuplicates(keys :+ tsCol)

  /** Stream-stream interval join: left events matched to right events of
    * the same key within [leftTs - lower, leftTs + upper]. Both sides need
    * watermarks so Spark can expire join state — the bounded-state form of
    * the reference pipeline's implicit "recent data joins recent data"
    * assumption. Works identically on batch frames (tested for parity).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTsCol: String, rightTsCol: String,
                   lower: String, upper: String): DataFrame = {
    val l = left.alias("l")
    val r = right.alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTsCol") >= col(s"l.$leftTsCol") - expr(s"INTERVAL $lower") &&
        col(s"r.$rightTsCol") <= col(s"l.$leftTsCol") + expr(s"INTERVAL $upper"))
  }

  /** T8: stateful per-key processing — running (count, sum) per user via
    * mapGroupsWithState; state is one small tuple per key, timeout-free
    * here (bounded key space), watermark-bounded in production.
    */
  def runningUserTotals(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), (Long, Long, Double)](
        GroupStateTimeout.NoTimeout) {
        case (uid, rows, state) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0
          var s = s0
          rows.foreach { r => n += 1; s += r._2 }
          state.update((n, s))
          (uid, n, s)
      }
      .toDF("user_id", "n", "sum_value")
      .withColumn("sum_value", round(col("sum_value"), 4))
  }

  /** T2: clear torn artifacts a crash can leave in a Spark streaming
    * checkpoint (and a file sink's manifest), so a restart can resume —
    * the runbook operation made mechanical. Spark's offset/commit logs
    * and the sink manifest publish batch files by temp-create → rename;
    * a crash inside that window leaves (a) an orphan temp file, which
    * Spark 4's fresh-checkpoint verification refuses to start over
    * ([STATE_STORE_CHECKPOINT_LOCATION_NOT_EMPTY]), or (b) a zero-byte /
    * unparseable NEWEST batch file (empty temp renamed, content never
    * flushed), which the log cannot deserialize on restart.
    *
    * Safe by construction:
    *  - orphan temp files (names that are not pure batch numbers) were
    *    never visible to any log — deleting them loses nothing;
    *  - only the HIGHEST-numbered batch file is probed, and removed
    *    only if unreadable. A torn offsets/N means batch N never ran
    *    (offsets are written BEFORE the batch) — it is replanned.
    *    A torn commits/N means batch N's sink commit already landed
    *    (the sink manifest commits before the commit log) — the rerun
    *    hits the manifest's "already committed" check and no-ops.
    *    Parseable history is never touched.
    *
    * Verified by the `restStream` family of `CrashInjectionSpec`: with
    * this recovery, a crash at EVERY mutating FS boundary of the
    * checkpoint + sink converges bit-for-bit to the no-crash state.
    */
  def recoverStreamingCheckpoint(spark: SparkSession, checkpoint: String,
                                 sinkDir: Option[String] = None): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dirs = Seq(s"$checkpoint/offsets", s"$checkpoint/commits") ++
      sinkDir.map(d => s"$d/_spark_metadata")
    dirs.foreach { dir =>
      val d = new org.apache.hadoop.fs.Path(dir)
      val fs = d.getFileSystem(conf)
      if (fs.exists(d)) {
        val st = fs.listStatus(d).toSeq.filter(_.isFile)
        val (batchFiles, temps) =
          st.partition(_.getPath.getName.matches("\\d+(\\.compact)?"))
        temps.foreach(s => fs.delete(s.getPath, false))
        batchFiles.sortBy(_.getPath.getName.takeWhile(_.isDigit).toLong)
          .lastOption.foreach { s =>
            val readable =
              try {
                val in = fs.open(s.getPath)
                val head =
                  try new String(in.readNBytes(2),
                                 java.nio.charset.StandardCharsets.UTF_8)
                  finally in.close()
                // every structured-streaming metadata log serializes
                // "v<version>\n..." — anything else is a torn write
                head.startsWith("v")
              } catch { case _: Exception => false }
            if (!readable) fs.delete(s.getPath, false)
          }
      }
    }
  }

  /** T8b: `flatMapGroupsWithState` — the 0..n-outputs-per-group stateful
    * API. Emits one alert row each time a user's cumulative value crosses
    * another multiple of `step` (so a batch can produce zero alerts, or
    * several if the total jumps multiple levels). State is one double per
    * key; bounded key space here, watermark/timeout-bounded in production.
    */
  def thresholdAlerts(df: DataFrame, step: Double): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Double, (Long, Long, Double)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (uid, rows, state) =>
          var total = state.getOption.getOrElse(0.0)
          val startLevel = math.floor(total / step).toLong
          rows.foreach(total += _._2)
          state.update(total)
          val endLevel = math.floor(total / step).toLong
          ((startLevel + 1) to endLevel)
            .map(k => (uid, k, total)).iterator
      }
      .toDF("user_id", "level", "total")
  }
}
