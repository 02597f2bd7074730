package graft

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver-visible exercises of the source/multimodal plumbing (SURVEY.md
  * §2.1 S4/S5, §2.10 L7). The Avro decode keys are oracled against the
  * known decoded constants (the frames are built from fixed demo rows, so
  * the expected output is a VALUES literal); the multimodal feature key is
  * oracled by replicating the declared stub codec's rolling hash in
  * DuckDB HUGEINT arithmetic (mod 2^64). Deeper semantics are asserted in
  * SourcesSpec/MultimodalSpec.
  */
object SourceQueries extends QueryPack {

  private val avroSchemaJson =
    """{"type":"record","name":"users","fields":[
      |{"name":"user_id","type":"long"},
      |{"name":"username","type":["null","string"],"default":null},
      |{"name":"account_type","type":["null","string"],"default":null},
      |{"name":"updated_at","type":"long"}]}""".stripMargin

  /** Generation 2 of the users schema: adds a nullable `tier` — the
    * backward-compatible evolution the reference's registry
    * compatibility mode permits (`README.md:138-141,260`).
    */
  private val gen2SchemaJson =
    """{"type":"record","name":"users","fields":[
      |{"name":"user_id","type":"long"},
      |{"name":"username","type":["null","string"],"default":null},
      |{"name":"account_type","type":["null","string"],"default":null},
      |{"name":"updated_at","type":"long"},
      |{"name":"tier","type":["null","string"],"default":null}]}"""
      .stripMargin

  /** An INCOMPATIBLE generation (user_id retyped long → string): what a
    * registry with enforcement disabled lets a producer publish; the
    * consumer must dead-letter, not crash.
    */
  private val poisonSchemaJson =
    """{"type":"record","name":"users","fields":[
      |{"name":"user_id","type":"string"},
      |{"name":"username","type":["null","string"],"default":null},
      |{"name":"account_type","type":["null","string"],"default":null},
      |{"name":"updated_at","type":"long"}]}""".stripMargin

  private val usersSchema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("username", StringType),
    StructField("account_type", StringType),
    StructField("updated_at", TimestampType)))

  /** The reference demo rows (`/root/reference/README.md:108-112`) framed
    * as Confluent wire-format Avro messages.
    */
  private def framedDemo: Seq[Array[Byte]] = {
    val schema = new Schema.Parser().parse(avroSchemaJson)
    val writer = new GenericDatumWriter[GenericRecord](schema)
    Seq((1L, "user1", "Bronze"), (2L, "user2", "Silver"), (3L, "user3", "Gold"))
      .map { case (id, name, acct) =>
        val rec = new GenericData.Record(schema)
        rec.put("user_id", id)
        rec.put("username", name)
        rec.put("account_type", acct)
        rec.put("updated_at", 1700000000000000L + id)
        val out = new ByteArrayOutputStream()
        val enc = EncoderFactory.get().binaryEncoder(out, null)
        writer.write(rec, enc)
        enc.flush()
        Array[Byte](0, 0, 0, 0, 7) ++ out.toByteArray // schema id 7
      }
  }

  val queries: Map[String, Q] = Map(
    // S4: Confluent-framed Avro → rows (header strip + schema id + decode).
    "q_avro_decode" -> ((s, dir) => {
      import s.implicits._
      val framed = framedDemo.toDF("value")
      val decoded = Sources.decodeAvro(
        framed, Sources.confluentPayload(col("value")), avroSchemaJson,
        usersSchema)
      decoded
        .withColumn("schema_id", lit(7L))
        .orderBy("user_id")
    }),

    // S4 end-to-end: registry-resolved decode of a stream carrying TWO
    // schema generations (gen 2 adds a nullable field) — Avro schema
    // resolution fills the default for gen-1 rows.
    "q_confluent_decode" -> ((s, dir) => {
      import s.implicits._
      val gen2Json =
        """{"type":"record","name":"users","fields":[
          |{"name":"user_id","type":"long"},
          |{"name":"username","type":["null","string"],"default":null},
          |{"name":"account_type","type":["null","string"],"default":null},
          |{"name":"updated_at","type":"long"},
          |{"name":"tier","type":["null","string"],"default":null}]}"""
          .stripMargin
      val gen2Schema = new Schema.Parser().parse(gen2Json)
      val writer2 = new GenericDatumWriter[GenericRecord](gen2Schema)
      val gen2Frame = {
        val rec = new GenericData.Record(gen2Schema)
        rec.put("user_id", 4L)
        rec.put("username", "user4")
        rec.put("account_type", "Gold")
        rec.put("updated_at", 1700000000000004L)
        rec.put("tier", "vip")
        val out = new ByteArrayOutputStream()
        val enc = EncoderFactory.get().binaryEncoder(out, null)
        writer2.write(rec, enc)
        enc.flush()
        Array[Byte](0, 0, 0, 0, 8) ++ out.toByteArray // schema id 8
      }
      val registry = Sources.StaticSchemaRegistry(
        Map(7 -> avroSchemaJson, 8 -> gen2Json))
      val framed = (framedDemo :+ gen2Frame).toDF("value")
      Sources.decodeConfluent(framed, col("value"), registry, gen2Json,
                              usersSchema.add(StructField("tier", StringType)))
        .orderBy("user_id")
    }),

    // L7: multimodal feature extraction over binary payloads synthesized
    // from the documents table (payload = utf8 bytes of the text).
    "q_multimodal_features" -> ((s, dir) => {
      Multimodal.extractFeatures(syntheticMedia(s, dir), 8)
        .select(col("media_id"), size(col("features")).cast("long").as("dim"),
                round(element_at(col("features"), 1).cast("double"), 6)
                  .as("f0"))
        .orderBy("media_id")
    }),

    // L7: metadata-only scan — the pruned-read path that never touches the
    // heavy payload column (oracled: the meta struct is synthesized
    // deterministically from documents).
    "q_multimodal_meta" -> ((s, dir) =>
      Multimodal.metadataOnly(syntheticMedia(s, dir))
        .orderBy("media_id")),

    // L7: deterministic payload byte-sampling (the frame-sample shape) —
    // oracled byte-for-byte because the synthesized payloads are ASCII.
    "q_multimodal_sample" -> ((s, dir) =>
      Multimodal.samplePayload(syntheticMedia(s, dir), 4)
        .select(col("media_id"), col("sample_idx").cast("long"),
                col("byte"))
        .orderBy("media_id", "sample_idx")),

    // S7 round-trip: export the documents table as hash-sharded JSONL
    // ([[Sources.writeJsonlShards]] — the training-shard interchange
    // format), read the shards back with an EXPLICIT schema (schema
    // inference is a second full pass over the corpus at 100 TB — never
    // pay it), and aggregate per language. The oracle computes the same
    // aggregates from the parquet source directly, so a hash match
    // certifies the export→parse loop is lossless (JSON string escaping,
    // long round-trip, partition-column recovery) through the driver's
    // cross-engine gate — not just the SourcesSpec unit contract.
    "q_scan_jsonl" -> ((s, dir) => {
      // path carries the Spark application id: two concurrent harness
      // processes (or a dir hashCode collision) must never share an
      // overwrite-mode export directory
      val out = sys.props("java.io.tmpdir") +
        s"/graft_jsonl_scan_${s.sparkContext.applicationId}_" +
        Integer.toHexString(dir.hashCode)
      Sources.writeJsonlShards(
        Tables(s, dir, "documents")
          .withColumn("shard", pmod(xxhash64(col("doc_id")), lit(8))),
        out, "shard", Seq("doc_id"))
      s.read
        .schema("doc_id LONG, text STRING, lang STRING, " +
                "source STRING, n_chars LONG")
        .json(out)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
             sum("n_chars").as("sum_chars"),
             sum(length(col("text"))).cast("long").as("sum_text_len"),
             sum("doc_id").as("id_sum"),
             min("doc_id").as("id_min"),
             max("doc_id").as("id_max"))
        .orderBy("lang")
    }),

    // S5 END-TO-END UNDER THE ORACLE: Debezium envelope unwrap
    // ([[Sources.unwrapCdc]] ≙ ExtractNewRecordState,
    // `/root/reference/README.md:97` "after.state only") driven through
    // a full change-stream collapse. The events table is framed as a
    // deterministic Debezium envelope in-plan — `event_type = 'click'`
    // rows become deletes (op 'd', image in `before`), everything else
    // upserts (op 'u', image in `after`) — then unwrapped, collapsed to
    // the latest version per entity ([[Cdc.latest]]), and filtered of
    // entities whose LAST change was the delete tombstone: the
    // ReplacingMergeTree final-state read the reference pipeline serves.
    // The oracle recomputes the same survivor set straight off the
    // events table, so a hash match certifies op routing, before/after
    // image selection, and tombstone handling end to end.
    "q_cdc_unwrap" -> ((s, dir) => {
      val payload = struct(col("event_id"), col("ts"), col("user_id"),
                           col("event_type"), col("value"))
      // null-SAFE delete predicate: a NULL event_type must frame as an
      // upsert WITH its image intact — a three-valued `!isDelete` would
      // leave both before and after NULL and silently drop the row's
      // real columns (latent until a fixture ships a NULL event_type)
      val isDelete = coalesce(col("event_type") === "click", lit(false))
      val enveloped = Tables(s, dir, "events").select(
        struct(
          when(isDelete, lit("d")).otherwise(lit("u")).as("op"),
          when(isDelete, payload).as("before"),
          when(isDelete, lit(null)).otherwise(payload).as("after"))
          .as("envelope"))
      val unwrapped = Sources.unwrapCdc(enveloped)
      Cdc.latest(unwrapped, Seq("user_id"), Seq(col("ts"), col("event_id")))
        .filter(col("op") =!= "d")
        .select("user_id", "ts", "event_id", "event_type", "value")
        .orderBy("user_id")
    }),

    // S9 END-TO-END UNDER THE ORACLE: the events table is produced
    // through the Kafka REST Proxy protocol ([[Sources.restProduce]],
    // binary-embedded base64 over real localhost HTTP against
    // [[RestProxy.InMemoryServer]] — the proxy stand-in, the same role
    // MemoryStream plays for the executed streaming keys) in TWO waves,
    // and consumed back distributed ([[Sources.restConsumeWithCursor]],
    // one bounded offset range per Kafka partition, one executor task
    // each), with wave 1's cursor taken BEFORE wave 2 is produced — so a
    // hash match certifies produce framing, key/payload base64
    // round-trip, explicit-partition routing, bounded per-partition
    // consume, and snapshot→poll cursor continuity on the REST edge,
    // with zero record loss or duplication. `n_routed`/`n_keyed` must
    // equal `n`: every consumed record carries the partition it was
    // routed to and the key it was produced with.
    "q_rest_ingest" -> ((s, dir) => {
      val srv = new RestProxy.InMemoryServer(numPartitions = 8)
      val url = srv.start()
      try {
        val ev = Tables(s, dir, "events").select(
          col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
        def produce(w: org.apache.spark.sql.DataFrame): Unit =
          Sources.restProduce(
            w, url, "events",
            col("user_id").cast("string"),
            to_json(struct(col("event_id"), col("user_id"),
                           col("event_type"), col("ts_us"))),
            pmod(col("event_id"), lit(8)))
        val wave2 = pmod(col("event_id"), lit(3)) === 0
        produce(ev.filter(!wave2))
        val (b1, cursor) = Sources.restConsumeWithCursor(s, url, "events")
        produce(ev.filter(wave2))
        val (b2, _) = Sources.restConsumeWithCursor(s, url, "events", cursor)
        val parsed = b1.unionByName(b2).select(
          from_json(col("value").cast("string"),
            StructType.fromDDL("event_id LONG, user_id LONG, " +
                               "event_type STRING, ts_us LONG")).as("r"),
          col("partition"),
          col("key").cast("string").cast("long").as("key_uid"))
          .select(col("r.*"), col("partition"), col("key_uid"))
        val out = parsed.groupBy("event_type").agg(
          count(lit(1)).as("n"),
          sum("event_id").as("id_sum"),
          min("event_id").as("id_min"),
          max("event_id").as("id_max"),
          sum("user_id").as("uid_sum"),
          countDistinct("user_id").as("n_users"),
          min("ts_us").as("ts_min"),
          max("ts_us").as("ts_max"),
          sum(when(col("partition") <=>
                     pmod(col("event_id"), lit(8)).cast("int"), 1L)
            .otherwise(0L)).as("n_routed"),
          sum(when(col("key_uid") <=> col("user_id"), 1L).otherwise(0L))
            .as("n_keyed"))
        // the pipeline must finish while the stub proxy is alive — run it
        // here and hand back the (≤ #event_types rows) result locally
        val rows = out.collect().toIndexedSeq
        s.createDataFrame(
          new java.util.ArrayList[Row](rows.asJava), out.schema)
          .orderBy(asc_nulls_first("event_type"))
      } finally srv.stop()
    }),

    // S9 AS A STRUCTURED STREAMING SOURCE, EXECUTED UNDER THE ORACLE:
    // the same two-wave events feed as q_rest_ingest, but consumed
    // through `spark.readStream.format("graft-rest")` ([[RestProxySource]],
    // a DataSource V2 MicroBatchStream) with the ENGINE owning the
    // offset lifecycle — per-trigger admission caps force multiple
    // micro-batches, the stream is STOPPED between the waves, and the
    // restart resumes from the checkpoint's offset log. The exactly-once
    // file-sink output must aggregate to the same per-type
    // counts/sums/extremes as the raw events table, with the same
    // per-record routing and key assertions as q_rest_ingest — so a hash
    // match certifies the source's offset planning, admission control,
    // checkpoint resume, and reader, end to end through the engine.
    "q_rest_stream" -> ((s, dir) => {
      val srv = new RestProxy.InMemoryServer(numPartitions = 4)
      val url = srv.start()
      val base = sys.props("java.io.tmpdir") +
        s"/graft_rest_stream_${s.sparkContext.applicationId}_" +
        Integer.toHexString(dir.hashCode)
      val out = s"$base/sink"
      val ckpt = s"$base/ckpt"
      try {
        // fresh run: the tmp sink/checkpoint must not carry a previous
        // invocation's batches
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val ev = Tables(s, dir, "events").select(
          col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
        def produce(w: org.apache.spark.sql.DataFrame): Unit =
          Sources.restProduce(
            w, url, "events",
            col("user_id").cast("string"),
            to_json(struct(col("event_id"), col("user_id"),
                           col("event_type"), col("ts_us"))),
            pmod(col("event_id"), lit(4)))
        def runOnce(): Unit = {
          val q = s.readStream.format("graft-rest")
            .option("url", url).option("topic", "events")
            .option("maxRecordsPerPartition", "4096")
            .load()
            .writeStream.format("parquet")
            .option("checkpointLocation", ckpt)
            .option("path", out)
            .start()
          q.processAllAvailable()
          q.stop()
        }
        val wave2 = pmod(col("event_id"), lit(3)) === 0
        produce(ev.filter(!wave2))
        runOnce()
        produce(ev.filter(wave2)) // arrives while the stream is DOWN
        runOnce()                 // checkpoint restart picks it up
        val parsed = s.read.parquet(out).select(
          from_json(col("value").cast("string"),
            StructType.fromDDL("event_id LONG, user_id LONG, " +
                               "event_type STRING, ts_us LONG")).as("r"),
          col("partition"),
          col("key").cast("string").cast("long").as("key_uid"))
          .select(col("r.*"), col("partition"), col("key_uid"))
        val agg = parsed.groupBy("event_type").agg(
          count(lit(1)).as("n"),
          sum("event_id").as("id_sum"),
          min("event_id").as("id_min"),
          max("event_id").as("id_max"),
          sum("user_id").as("uid_sum"),
          countDistinct("user_id").as("n_users"),
          min("ts_us").as("ts_min"),
          max("ts_us").as("ts_max"),
          sum(when(col("partition") <=>
                     pmod(col("event_id"), lit(4)).cast("int"), 1L)
            .otherwise(0L)).as("n_routed"),
          sum(when(col("key_uid") <=> col("user_id"), 1L).otherwise(0L))
            .as("n_keyed"))
        val rows = agg.collect().toIndexedSeq
        s.createDataFrame(
          new java.util.ArrayList[Row](rows.asJava), agg.schema)
          .orderBy(asc_nulls_first("event_type"))
      } finally srv.stop()
    }),

    // S9+S4: SCHEMA EVOLUTION THROUGH THE STREAMING REST PATH, EXECUTED
    // UNDER THE ORACLE — the reference's registry-compatibility story
    // (`README.md:138-141,260`) composed end-to-end: Confluent-framed
    // Avro produced through the proxy in TWO waves with the WRITER
    // schema changing mid-stream (wave 1 = gen 1; wave 2 = gen 2 adding
    // a nullable `tier`, plus frames claiming an INCOMPATIBLE schema id
    // — user_id retyped to string, what a producer publishes when
    // enforcement is off). The stream is STOPPED between waves;
    // `graft-rest` resumes from its checkpoint, and
    // [[Sources.decodeConfluentSafe]] runs INSIDE the stream: gen-1
    // rows resolve against the gen-2 reader (tier defaults null),
    // gen-2 rows decode fully, incompatible frames dead-letter instead
    // of failing the query. Output: every decoded row plus one 'dead'
    // row per poisoned frame — all derivable from the events table, so
    // the full result hash-matches DuckDB.
    "q_rest_stream_evolve" -> ((s, dir) => {
      import s.implicits._
      val srv = new RestProxy.InMemoryServer(numPartitions = 4)
      val url = srv.start()
      val base = sys.props("java.io.tmpdir") +
        s"/graft_rest_evolve_${s.sparkContext.applicationId}_" +
        Integer.toHexString(dir.hashCode)
      val out = s"$base/sink"
      val ckpt = s"$base/ckpt"
      try {
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val users = Tables(s, dir, "events")
          .select(col("user_id")).distinct()
        val g1 = avroSchemaJson
        val g2 = gen2SchemaJson
        // executor-side Avro framing (one writer per partition — the
        // mirror of decodeConfluentSafe's one-reader-per-partition)
        def framed(w: org.apache.spark.sql.DataFrame,
                   schemaId: Int): org.apache.spark.sql.DataFrame =
          w.select(col("user_id")).as[Long].mapPartitions { it =>
            val s1 = new Schema.Parser().parse(g1)
            val s2 = new Schema.Parser().parse(g2)
            val w1 = new GenericDatumWriter[GenericRecord](s1)
            val w2 = new GenericDatumWriter[GenericRecord](s2)
            it.map { uid =>
              val gen2 = schemaId == 8
              val rec = new GenericData.Record(if (gen2) s2 else s1)
              rec.put("user_id", uid)
              rec.put("username", s"u$uid")
              rec.put("account_type",
                      Seq("Bronze", "Silver", "Gold")((uid % 3).toInt))
              rec.put("updated_at", 1700000000000000L + uid)
              if (gen2) rec.put("tier", s"vip${uid % 4}")
              val bos = new ByteArrayOutputStream()
              val enc = EncoderFactory.get().binaryEncoder(bos, null)
              (if (gen2) w2 else w1).write(rec, enc)
              enc.flush()
              (uid,
               Array[Byte](0, 0, 0, 0, schemaId.toByte) ++ bos.toByteArray)
            }
          }.toDF("uid", "framed")
        def produce(df: org.apache.spark.sql.DataFrame): Unit =
          Sources.restProduce(df, url, "users",
                              col("uid").cast("string"), col("framed"),
                              pmod(col("uid"), lit(4)))
        val registry = Sources.StaticSchemaRegistry(
          Map(7 -> avroSchemaJson, 8 -> gen2SchemaJson,
              9 -> poisonSchemaJson))
        def runOnce(): Unit = {
          val stream = s.readStream.format("graft-rest")
            .option("url", url).option("topic", "users")
            .option("maxRecordsPerPartition", "64")
            .load()
          val decoded = Sources.decodeConfluentSafe(
            stream, col("value"), registry, gen2SchemaJson,
            usersSchema.add(StructField("tier", StringType)))
          val q = decoded.writeStream.format("parquet")
            .option("checkpointLocation", ckpt)
            .option("path", out)
            .start()
          q.processAllAvailable()
          q.stop()
        }
        val odd = pmod(col("user_id"), lit(2)) === 1
        val poison = pmod(col("user_id"), lit(7)) === 0
        produce(framed(users.filter(!odd), 7))
        runOnce()
        // generation 2 and the poison frames arrive while the stream
        // is DOWN; the restart decodes them from the checkpoint on
        produce(framed(users.filter(odd && !poison), 8))
        produce(framed(users.filter(odd && poison), 9))
        runOnce()
        s.read.parquet(out)
          .select(col("user_id"), col("username"), col("account_type"),
                  col("tier"),
                  when(col("__error").isNull, "ok").otherwise("dead")
                    .as("status"))
          .orderBy(asc_nulls_first("user_id"),
                   asc_nulls_first("username"))
      } finally srv.stop()
    }),

    // S2 AS A STRUCTURED STREAMING SOURCE, EXECUTED UNDER THE ORACLE:
    // the polling-CDC capture loop with the ENGINE owning the cursor
    // lifecycle ([[JdbcCdcSource]], `readStream.format("graft-jdbc")`).
    // The events table is seeded into an embedded-Derby feed table (the
    // sandbox's PostgreSQL stand-in, as in JdbcSpec) in TWO waves; the
    // stream drains wave 1 through per-trigger admission caps (multiple
    // checkpointed micro-batches), is STOPPED, wave 2 lands while it is
    // down, and the restart resumes from the checkpoint's offset log —
    // batch 0 doubling as the initial snapshot (startingCursor=earliest,
    // Debezium's snapshot.mode=initial). A hash match against the raw
    // events table certifies schema inference over JDBC metadata,
    // rank-balanced range planning, cursor-granular admission, restart
    // resume, and the exactly-once file sink, end to end.
    "q_jdbc_stream" -> ((s, dir) => {
      val tag = Integer.toHexString(dir.hashCode)
      val db = s"graftfeed_$tag"
      val url = s"jdbc:derby:memory:$db;create=true"
      val base = sys.props("java.io.tmpdir") +
        s"/graft_jdbc_stream_${s.sparkContext.applicationId}_$tag"
      val out = s"$base/sink"
      val ckpt = s"$base/ckpt"
      try {
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val ev = Tables(s, dir, "events").select(
          col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
        def seed(w: org.apache.spark.sql.DataFrame): Unit =
          Sources.jdbcSink(w.coalesce(4), url, "events_feed")
        def runOnce(): Unit = {
          val q = s.readStream.format("graft-jdbc")
            .option("url", url).option("table", "events_feed")
            .option("cursorColumn", "event_id")
            .option("numPartitions", "4")
            .option("maxRowsPerBatch", "4096")
            .load()
            .writeStream.format("parquet")
            .option("checkpointLocation", ckpt)
            .option("path", out)
            .start()
          q.processAllAvailable()
          q.stop()
        }
        // the wave seam respects the source's append-only contract:
        // rows committed later carry HIGHER cursor values (a WAL
        // position never goes backwards), so the split is by cursor
        // value, not by hash — the boundary is a bounded two-long
        // metadata read
        val Row(idLo: Long, idHi: Long) =
          ev.agg(min("event_id"), max("event_id")).head()
        val seam = idLo + (idHi - idLo) * 2 / 3
        seed(ev.filter(col("event_id") <= seam))
        runOnce()
        seed(ev.filter(col("event_id") > seam)) // lands while DOWN
        runOnce()              // checkpoint restart picks it up
        val agg = s.read.parquet(out).groupBy("event_type").agg(
          count(lit(1)).as("n"),
          sum("event_id").as("id_sum"),
          min("event_id").as("id_min"),
          max("event_id").as("id_max"),
          sum("user_id").as("uid_sum"),
          countDistinct("user_id").as("n_users"),
          min("ts_us").as("ts_min"),
          max("ts_us").as("ts_max"))
        val rows = agg.collect().toIndexedSeq
        s.createDataFrame(
          new java.util.ArrayList[Row](rows.asJava), agg.schema)
          .orderBy(asc_nulls_first("event_type"))
      } finally {
        // in-memory Derby outlives the key inside a 302-key Verify JVM
        // unless dropped; success surfaces as SQLState 08006
        try java.sql.DriverManager
          .getConnection(s"jdbc:derby:memory:$db;drop=true")
        catch { case _: java.sql.SQLException => () }
        // sink + checkpoint are per-run scratch and the result rows are
        // already collected — delete now, not at the start of a later
        // identical run (which a one-shot Verify JVM never reaches)
        try new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(new org.apache.hadoop.fs.Path(base), true)
        catch { case _: java.io.IOException => () }
      }
    }),

    // THE REFERENCE'S SIGNATURE FLOW, END TO END THROUGH THE ENGINE:
    // source database → change stream → latest-state serving store
    // (`/root/reference/README.md`'s PostgreSQL → Debezium →
    // ReplacingMergeTree pipeline), composed from the engine-owned
    // pieces: the `graft-jdbc` DSv2 source streams the Derby feed
    // through checkpointed micro-batches (stop/restart seam as above),
    // and every batch merges into the bucketed upsert store
    // ([[Streaming.upsertSink]] — the crash-swept incremental sink) —
    // so the final store is the latest row per user, whatever batch
    // boundaries the admission cap produced. The hash oracle is the
    // same latest-per-key SQL as q_upsert_latest: the composed
    // streaming pipeline must land EXACTLY the batch semantics.
    "q_jdbc_stream_upsert" -> ((s, dir) => {
      val tag = Integer.toHexString(dir.hashCode)
      val db = s"graftups_$tag"
      val url = s"jdbc:derby:memory:$db;create=true"
      val base = sys.props("java.io.tmpdir") +
        s"/graft_jdbc_upsert_${s.sparkContext.applicationId}_$tag"
      val state = s"$base/state"
      val ckpt = s"$base/ckpt"
      try {
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        // change feed keyed by event_id (the WAL-position stand-in);
        // null-ts rows are excluded on BOTH sides (a version column
        // must order totally; the oracle mirrors the filter)
        val ev = Tables(s, dir, "events")
          .filter(col("ts").isNotNull)
          .select(col("event_id"), col("user_id"), col("event_type"),
                  col("value"), unix_micros(col("ts")).as("ts_us"))
        def seed(w: org.apache.spark.sql.DataFrame): Unit =
          Sources.jdbcSink(w.coalesce(4), url, "change_feed")
        def runOnce(): Unit = {
          val src = s.readStream.format("graft-jdbc")
            .option("url", url).option("table", "change_feed")
            .option("cursorColumn", "event_id")
            .option("numPartitions", "4")
            .option("maxRowsPerBatch", "4096")
            .load()
            .select(col("event_id").cast("long"),
                    col("user_id").cast("long"), col("event_type"),
                    col("value"), col("ts_us").cast("long"))
          val q = Streaming.upsertSink(src, state, ckpt,
                                       Seq("user_id"),
                                       Seq("ts_us", "event_id")).start()
          q.processAllAvailable()
          q.stop()
        }
        val Row(idLo: Long, idHi: Long) =
          ev.agg(min("event_id"), max("event_id")).head()
        val seam = idLo + (idHi - idLo) * 2 / 3
        seed(ev.filter(col("event_id") <= seam))
        runOnce()
        seed(ev.filter(col("event_id") > seam)) // lands while DOWN
        runOnce()
        val out = s.read.parquet(state)
          .select("user_id", "ts_us", "event_id", "event_type", "value")
        val rows = out.collect().toIndexedSeq
        s.createDataFrame(
          new java.util.ArrayList[Row](rows.asJava), out.schema)
          .orderBy("user_id")
      } finally {
        try java.sql.DriverManager
          .getConnection(s"jdbc:derby:memory:$db;drop=true")
        catch { case _: java.sql.SQLException => () }
        // per-run state + checkpoint scratch; results already collected
        try new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(new org.apache.hadoop.fs.Path(base), true)
        catch { case _: java.io.IOException => () }
      }
    })
  )

  private def syntheticMedia(s: org.apache.spark.sql.SparkSession,
                             dir: String) =
    Tables(s, dir, "documents")
      .select(col("doc_id").as("media_id"), lit("text").as("kind"),
              col("text").cast("binary").as("payload"),
              struct(lit(null).cast("int").as("width"),
                     lit(null).cast("int").as("height"),
                     col("n_chars").as("duration_ms"),
                     lit("text/plain").as("mime")).as("meta"))

  val oracles: Map[String, String] = Map(
    // The framed bytes are built from the reference demo's three fixed
    // rows, so the decoded output is a known constant: the oracle states
    // it as a VALUES literal. A decode bug (header strip, varint zig-zag,
    // union branch, micros→timestamp) breaks the hash match.
    "q_avro_decode" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), 'user1', 'Bronze',
        |   make_timestamp(1700000000000001), CAST(7 AS BIGINT)),
        |  (CAST(2 AS BIGINT), 'user2', 'Silver',
        |   make_timestamp(1700000000000002), CAST(7 AS BIGINT)),
        |  (CAST(3 AS BIGINT), 'user3', 'Gold',
        |   make_timestamp(1700000000000003), CAST(7 AS BIGINT)))
        |  AS t(user_id, username, account_type, updated_at, schema_id)
        |ORDER BY user_id""".stripMargin,

    // Registry-resolved two-generation decode: gen-1 rows resolve against
    // the gen-2 reader schema and fill the nullable `tier` default.
    "q_confluent_decode" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), 'user1', 'Bronze',
        |   make_timestamp(1700000000000001), CAST(NULL AS VARCHAR)),
        |  (CAST(2 AS BIGINT), 'user2', 'Silver',
        |   make_timestamp(1700000000000002), CAST(NULL AS VARCHAR)),
        |  (CAST(3 AS BIGINT), 'user3', 'Gold',
        |   make_timestamp(1700000000000003), CAST(NULL AS VARCHAR)),
        |  (CAST(4 AS BIGINT), 'user4', 'Gold',
        |   make_timestamp(1700000000000004), 'vip'))
        |  AS t(user_id, username, account_type, updated_at, tier)
        |ORDER BY user_id""".stripMargin,

    // The evolve stream's decoded output is fully derivable from the
    // events table: even user_ids decode as gen 1 (tier null), odd
    // non-poison ids as gen 2 (tier vip<uid%4>), and each poisoned
    // frame (odd, uid % 7 = 0) dead-letters to one all-null 'dead' row.
    "q_rest_stream_evolve" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events)
        |SELECT user_id,
        |  'u' || CAST(user_id AS VARCHAR) AS username,
        |  CASE CAST(user_id % 3 AS INTEGER)
        |    WHEN 0 THEN 'Bronze' WHEN 1 THEN 'Silver' ELSE 'Gold'
        |  END AS account_type,
        |  CASE WHEN user_id % 2 = 1
        |       THEN 'vip' || CAST(user_id % 4 AS VARCHAR) END AS tier,
        |  'ok' AS status
        |FROM u WHERE user_id % 2 = 0 OR user_id % 7 <> 0
        |UNION ALL
        |SELECT NULL, NULL, NULL, NULL, 'dead' FROM u
        |WHERE user_id % 2 = 1 AND user_id % 7 = 0
        |ORDER BY user_id NULLS FIRST, username NULLS FIRST""".stripMargin,

    // The stub codec is a declared deterministic fake (Multimodal.scala:37)
    // — a 31-rolling-hash of the payload bytes plus one LCG step per
    // feature. That makes it DuckDB-expressible: replicate the mod-2^64
    // arithmetic in HUGEINT and compare f0 end-to-end through the
    // mapPartitions/encoder plumbing (the part a real codec would reuse).
    "q_multimodal_features" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    list_prepend(CAST(1125899906842597 AS HUGEINT),
        |      list_transform(range(1, length(text)+1),
        |        i -> CAST(ord(substring(text, CAST(i AS INTEGER), 1))
        |               AS HUGEINT))) AS xs
        |  FROM documents)
        |SELECT doc_id AS media_id, CAST(8 AS BIGINT) AS dim,
        |  round(CAST(((list_reduce(xs,
        |      (acc, x) -> (31*acc + x) % 18446744073709551616)
        |    * 6364136223846793005 + 1442695040888963407)
        |    % 18446744073709551616)
        |    // 1099511627776 % 1000 AS DOUBLE) / 1000.0, 6) AS f0
        |FROM b ORDER BY media_id NULLS FIRST""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT doc_id AS media_id, 'text' AS kind,
        |  CAST(NULL AS INTEGER) AS width, CAST(NULL AS INTEGER) AS height,
        |  n_chars AS duration_ms, 'text/plain' AS mime
        |FROM documents ORDER BY media_id NULLS FIRST""".stripMargin,

    "q_multimodal_sample" ->
      """SELECT doc_id AS media_id, CAST(i AS BIGINT) AS sample_idx,
        |  ord(substring(text,
        |    CAST((i * 2654435761) % length(text) AS INTEGER) + 1, 1))
        |    AS byte
        |FROM (SELECT doc_id, text, unnest(range(0, 4)) AS i
        |      FROM documents) t
        |ORDER BY media_id NULLS FIRST, sample_idx NULLS FIRST""".stripMargin,

    // Aggregates straight off the parquet source — a match proves the
    // Spark side's JSONL export→read round-trip dropped/garbled nothing.
    "q_scan_jsonl" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_text_len,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
        |  min(doc_id) AS id_min, max(doc_id) AS id_max
        |FROM documents GROUP BY lang
        |ORDER BY lang NULLS FIRST""".stripMargin,

    // Survivors = entities whose latest change (by ts, event_id) was not
    // the 'click'→delete tombstone — recomputed straight off events. A
    // NULL event_type is an upsert (the Spark side's null-safe framing),
    // so the tombstone filter must keep it: OR IS NULL.
    "q_cdc_unwrap" ->
      """SELECT user_id, ts, event_id, event_type, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST) AS rn
        |  FROM events) t
        |WHERE rn = 1 AND (event_type <> 'click' OR event_type IS NULL)
        |ORDER BY user_id NULLS FIRST""".stripMargin,

    // Aggregates straight off the parquet source. A hash match proves the
    // REST produce→consume loop delivered every event exactly once with
    // key, payload, and partition routing intact: n_routed/n_keyed (the
    // Spark side's per-record routing/key assertions) must equal the
    // plain count, and the sums/extremes catch any lost, duplicated, or
    // garbled record.
    "q_rest_ingest" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(event_id) AS BIGINT) AS id_sum,
        |  min(event_id) AS id_min, max(event_id) AS id_max,
        |  CAST(sum(user_id) AS BIGINT) AS uid_sum,
        |  count(DISTINCT user_id) AS n_users,
        |  min(epoch_us(ts)) AS ts_min, max(epoch_us(ts)) AS ts_max,
        |  count(*) AS n_routed, count(*) AS n_keyed
        |FROM events GROUP BY event_type
        |ORDER BY event_type NULLS FIRST""".stripMargin,

    // Identical aggregates to q_rest_ingest: the streaming-source run
    // must deliver exactly the same record set through the engine's
    // checkpointed micro-batches as the batch consume path does.
    "q_rest_stream" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(event_id) AS BIGINT) AS id_sum,
        |  min(event_id) AS id_min, max(event_id) AS id_max,
        |  CAST(sum(user_id) AS BIGINT) AS uid_sum,
        |  count(DISTINCT user_id) AS n_users,
        |  min(epoch_us(ts)) AS ts_min, max(epoch_us(ts)) AS ts_max,
        |  count(*) AS n_routed, count(*) AS n_keyed
        |FROM events GROUP BY event_type
        |ORDER BY event_type NULLS FIRST""".stripMargin,

    // The graft-jdbc streaming run must deliver exactly the events
    // table once through Derby and the engine's checkpointed
    // micro-batches — same per-type aggregates as the REST edge keys.
    "q_jdbc_stream" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(event_id) AS BIGINT) AS id_sum,
        |  min(event_id) AS id_min, max(event_id) AS id_max,
        |  CAST(sum(user_id) AS BIGINT) AS uid_sum,
        |  count(DISTINCT user_id) AS n_users,
        |  min(epoch_us(ts)) AS ts_min, max(epoch_us(ts)) AS ts_max
        |FROM events GROUP BY event_type
        |ORDER BY event_type NULLS FIRST""".stripMargin,

    // The composed stream (graft-jdbc source → bucketed upsert store)
    // must land exactly the batch latest-per-key semantics — the same
    // SQL as q_upsert_latest, on the null-ts-filtered feed, with ts as
    // the epoch-micros version column the Derby feed carries.
    "q_jdbc_stream_upsert" ->
      """SELECT user_id, ts_us, event_id, event_type, value FROM (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
        |    value, row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE ts IS NOT NULL) t
        |WHERE rn = 1 ORDER BY user_id NULLS FIRST""".stripMargin
  )
}
