package graft

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S4/S5 unit tests with hand-framed Confluent messages (SURVEY.md §7.5):
  * magic byte 0x0 + big-endian schema id + Avro body, encoded with the
  * same core Avro runtime the decoder uses.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private val avroSchemaJson =
    """{"type":"record","name":"users","fields":[
      |{"name":"user_id","type":"long"},
      |{"name":"username","type":["null","string"],"default":null},
      |{"name":"account_type","type":["null","string"],"default":null},
      |{"name":"updated_at","type":"long"}]}""".stripMargin

  private val sparkSchema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("username", StringType),
    StructField("account_type", StringType),
    StructField("updated_at", TimestampType)))

  private def avroBytes(id: Long, name: String, acct: String,
                        micros: Long): Array[Byte] = {
    val schema = new Schema.Parser().parse(avroSchemaJson)
    val rec = new GenericData.Record(schema)
    rec.put("user_id", id)
    rec.put("username", name)
    rec.put("account_type", acct)
    rec.put("updated_at", micros)
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  private def frame(schemaId: Int, body: Array[Byte]): Array[Byte] =
    Array[Byte](0,
      (schemaId >> 24).toByte, (schemaId >> 16).toByte,
      (schemaId >> 8).toByte, schemaId.toByte) ++ body

  test("confluent header: schema id extracted, payload stripped") {
    val body = avroBytes(1L, "user1", "Bronze", 1700000000000000L)
    val df = Seq(frame(42, body), frame(65537, body)).toDF("value")
    val out = df.select(
      Sources.confluentSchemaId(col("value")).as("sid"),
      Sources.confluentPayload(col("value")).as("payload"))
    assert(out.select("sid").as[Int].collect() === Array(42, 65537))
    assert(out.select("payload").as[Array[Byte]].head() === body)
  }

  test("decodeAvro round-trips the reference users schema incl. " +
       "micros timestamps") {
    val demo = Seq(
      (1L, "user1", "Bronze", 1700000000123456L),
      (2L, "user2", "Silver", 1700000001000000L))
    val df = demo.map { case (i, n, a, t) => frame(7, avroBytes(i, n, a, t)) }
      .toDF("value")
    val decoded = Sources.decodeAvro(
      df, Sources.confluentPayload(col("value")), avroSchemaJson, sparkSchema)
    assert(decoded.schema === sparkSchema)
    val rows = decoded.orderBy("user_id")
      .select(col("user_id"), col("username"), col("account_type"),
              unix_micros(col("updated_at")))
      .as[(Long, String, String, Long)].collect()
    assert(rows === demo.toArray)
  }

  test("decodeConfluent resolves writer schemas by id through the " +
       "registry across two schema generations") {
    // gen 1: the original users schema; gen 2 adds a nullable field with a
    // default — the compatible-evolution case the reference's registry
    // enforces on producers
    val gen2Json =
      """{"type":"record","name":"users","fields":[
        |{"name":"user_id","type":"long"},
        |{"name":"username","type":["null","string"],"default":null},
        |{"name":"account_type","type":["null","string"],"default":null},
        |{"name":"updated_at","type":"long"},
        |{"name":"tier","type":["null","string"],"default":null}]}"""
        .stripMargin
    val gen2Schema = new Schema.Parser().parse(gen2Json)
    def gen2Bytes(id: Long, name: String, acct: String, micros: Long,
                  tier: String): Array[Byte] = {
      val rec = new GenericData.Record(gen2Schema)
      rec.put("user_id", id)
      rec.put("username", name)
      rec.put("account_type", acct)
      rec.put("updated_at", micros)
      rec.put("tier", tier)
      val out = new ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(out, null)
      new GenericDatumWriter[GenericRecord](gen2Schema).write(rec, enc)
      enc.flush()
      out.toByteArray
    }
    val registry = Sources.StaticSchemaRegistry(
      Map(1 -> avroSchemaJson, 2 -> gen2Json))
    val targetSchema = sparkSchema.add(StructField("tier", StringType))
    // one stream, both generations interleaved
    val df = Seq(
      frame(1, avroBytes(1L, "user1", "Bronze", 1700000000123456L)),
      frame(2, gen2Bytes(2L, "user2", "Silver", 1700000001000000L, "vip")),
      frame(1, avroBytes(3L, "user3", "Gold", 1700000002000000L))
    ).toDF("value")
    val decoded = Sources.decodeConfluent(df, col("value"), registry,
                                          gen2Json, targetSchema)
    assert(decoded.schema === targetSchema)
    val rows = decoded.orderBy("user_id")
      .select(col("user_id"), col("username"),
              unix_micros(col("updated_at")), col("tier"))
      .as[(Long, String, Long, String)].collect()
    assert(rows === Array(
      (1L, "user1", 1700000000123456L, null),   // gen-1 row: default fills
      (2L, "user2", 1700000001000000L, "vip"),  // gen-2 row: field present
      (3L, "user3", 1700000002000000L, null)))
    // unknown id surfaces, not swallowed
    val bad = Seq(frame(9, avroBytes(1L, "x", "y", 0L))).toDF("value")
    val err = intercept[org.apache.spark.SparkException] {
      Sources.decodeConfluent(bad, col("value"), registry, gen2Json,
                              targetSchema).collect()
    }
    assert(err.getMessage.contains("schema id 9") ||
           Option(err.getCause).exists(_.getMessage.contains("schema id 9")))
  }

  test("schema compatibility: evolution rules enforced, incompatible " +
       "writers rejected with a clear verdict") {
    // added reader field WITH default: compatible (gen1 -> gen2)
    val withDefault = avroSchemaJson.replace(
      """{"name":"updated_at","type":"long"}]}""",
      """{"name":"updated_at","type":"long"},
        |{"name":"tier","type":["null","string"],"default":null}]}"""
        .stripMargin)
    assert(Sources.compatible(avroSchemaJson, withDefault))
    // added reader field WITHOUT default: incompatible
    val noDefault = avroSchemaJson.replace(
      """{"name":"updated_at","type":"long"}]}""",
      """{"name":"updated_at","type":"long"},
        |{"name":"tier","type":"string"}]}""".stripMargin)
    assert(!Sources.compatible(avroSchemaJson, noDefault))
    // field type change long -> string: incompatible
    val typeChange = avroSchemaJson.replace(
      """{"name":"updated_at","type":"long"}""",
      """{"name":"updated_at","type":"string"}""")
    assert(!Sources.compatible(avroSchemaJson, typeChange))
    // long -> double promotion is legal Avro resolution
    val promoted = avroSchemaJson.replace(
      """{"name":"updated_at","type":"long"}""",
      """{"name":"updated_at","type":"double"}""")
    assert(Sources.compatible(avroSchemaJson, promoted))

    // decodeConfluent surfaces the verdict per schema id
    val registry = Sources.StaticSchemaRegistry(Map(3 -> typeChange))
    val framed = Seq(frame(3, avroBytes(1L, "x", "y", 1L))).toDF("value")
    val err = intercept[org.apache.spark.SparkException] {
      Sources.decodeConfluent(framed, col("value"), registry,
                              avroSchemaJson, sparkSchema).collect()
    }
    val msg = err.getMessage +
      Option(err.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("schema id 3 is incompatible"))
  }

  test("decodeConfluentSafe dead-letters poisoned messages instead of " +
       "failing the batch") {
    val registry = Sources.StaticSchemaRegistry(Map(7 -> avroSchemaJson))
    val good = frame(7, avroBytes(1L, "user1", "Bronze", 1000000L))
    val badMagic = Array[Byte](9, 0, 0, 0, 7, 1, 2, 3)
    val unknownId = frame(99, avroBytes(2L, "user2", "Silver", 2000000L))
    val truncated = frame(7, avroBytes(3L, "user3", "Gold", 3000000L))
      .take(8) // body cut mid-record
    val df = Seq(good, badMagic, unknownId, truncated).toDF("value")
    val out = Sources.decodeConfluentSafe(df, col("value"), registry,
                                          avroSchemaJson, sparkSchema)
    assert(out.count() === 4) // nothing dropped, nothing thrown
    val ok = out.filter(col("__error").isNull)
    assert(ok.select("user_id").as[Long].collect() === Array(1L))
    val errs = out.filter(col("__error").isNotNull)
      .select("__error").as[String].collect()
    assert(errs.length === 3)
    assert(errs.exists(_.contains("magic byte")))
    assert(errs.exists(_.contains("schema id 99")))
  }

  test("compactPartitionedDir collapses appended small files, content " +
       "and layout unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact")
      .toString + "/store"
    // 4 appends × 2 partitions → many small files
    (1 to 4).foreach { i =>
      Seq((i.toLong, 0), (i.toLong + 100, 1)).toDF("v", "b")
        .repartition(2)
        .write.mode("append").partitionBy("b").parquet(dir)
    }
    def filesIn(b: Int) = new java.io.File(s"$dir/b=$b").listFiles()
      .map(_.getName).count(_.startsWith("part-"))
    val before = spark.read.parquet(dir).select("v", "b")
      .as[(Long, Int)].collect().sorted
    assert(filesIn(0) > 1 && filesIn(1) > 1)
    Sources.compactPartitionedDir(spark, dir, "b")
    assert(filesIn(0) === 1 && filesIn(1) === 1)
    val after = spark.read.parquet(dir).select("v", "b")
      .as[(Long, Int)].collect().sorted
    assert(after === before)
  }

  test("compactPartitionedDir swap recovery: a crash between delete " +
       "and rename strands the complete tmp (promoted on recover); a " +
       "crash before the delete leaves a duplicate tmp (dropped)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-r")
      .toString + "/store"
    Seq((1L, 0), (2L, 1)).toDF("v", "b")
      .write.mode("append").partitionBy("b").parquet(dir)
    val expect = spark.read.parquet(dir).select("v", "b")
      .as[(Long, Int)].collect().sorted
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val tmp = dir + Sources.CompactTmpSuffix
    // crash between delete and rename: only the complete tmp survives
    fs.rename(p(dir), p(tmp))
    Sources.recoverCompactedDir(spark, dir)
    assert(fs.exists(p(dir)) && !fs.exists(p(tmp)))
    assert(spark.read.parquet(dir).select("v", "b")
      .as[(Long, Int)].collect().sorted === expect)
    // crash BEFORE the delete: dir is complete, tmp is a duplicate —
    // recovery must drop the tmp (promoting it would double every row)
    org.apache.hadoop.fs.FileUtil.copy(
      fs, p(dir), fs, p(tmp), false,
      spark.sparkContext.hadoopConfiguration)
    Sources.recoverCompactedDir(spark, dir)
    assert(fs.exists(p(dir)) && !fs.exists(p(tmp)))
    assert(spark.read.parquet(dir).select("v", "b")
      .as[(Long, Int)].collect().sorted === expect)
  }

  test("unwrapCdc surfaces after-images and delete tombstones") {
    val img = StructType(Seq(StructField("user_id", LongType),
                             StructField("account_type", StringType)))
    val env = StructType(Seq(
      StructField("before", img), StructField("after", img),
      StructField("op", StringType), StructField("ts_ms", LongType)))
    val rows = Seq(
      org.apache.spark.sql.Row(null, org.apache.spark.sql.Row(1L, "Bronze"), "c", 1L),
      org.apache.spark.sql.Row(org.apache.spark.sql.Row(1L, "Bronze"),
        org.apache.spark.sql.Row(1L, "Gold"), "u", 2L),
      org.apache.spark.sql.Row(org.apache.spark.sql.Row(1L, "Gold"), null, "d", 3L))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(org.apache.spark.sql.Row(_))),
      StructType(Seq(StructField("envelope", env))))
    val out = Sources.unwrapCdc(df).orderBy("op")
      .select("user_id", "account_type", "op")
      .as[(Long, String, String)].collect()
    assert(out === Array((1L, "Bronze", "c"), (1L, "Gold", "d"),
                         (1L, "Gold", "u")))
    // the tombstone carries the before-image key so latest-state can drop it
  }

  test("appendColumnar partitioned write enables partition pruning") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    Sources.appendColumnar(docs, out, Seq("doc_id"), Seq("lang"))
    val pruned = spark.read.parquet(out).filter(col("lang") === "en")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(lang"),
           s"expected partition filter in plan:\n$scan")
    assert(pruned.count() ===
           docs.filter(col("lang") === "en").count())
  }

  test("dynamic partition pruning fires on partitioned fact x filtered dim") {
    val out = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    Tables(spark, "/root/testdata/sf0.001", "events")
      .write.partitionBy("event_type").mode("overwrite").parquet(out)
    val fact = spark.read.parquet(out)
    // dim must be a scan with a real Filter node (a constant-folded local
    // relation loses the selective-predicate signal DPP looks for)
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dim").toString
    Seq(("click", 1), ("view", 2), ("error", 3))
      .toDF("event_type", "w").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = fact.join(dim.filter(col("w") === 1), "event_type")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
           s"expected runtime partition pruning in plan:\n${plan.take(2500)}")
    // and the pruned join returns exactly the click rows
    assert(joined.count() ===
           Tables(spark, "/root/testdata/sf0.001", "events")
             .filter(col("event_type") === "click").count())
  }

  test("bloom skip index prunes to few files on a hit, everything on a " +
       "miss, and returns exactly the full-scan rows") {
    import org.apache.spark.sql.functions._
    val path = java.nio.file.Files.createTempDirectory("graft-bloom")
      .toString + "/docs"
    val docs = Tables(spark, sf("documents"), "documents")
      .select("doc_id", "source", "lang")
    Sources.writeBloomIndexed(docs, path, "source", 8)
    // the sidecar is metadata-sized: ≤ files × 16 words
    assert(spark.read.parquet(path + "__bloomidx").count() <= 8 * 16)
    val probe = docs.select("source").head.getString(0)
    val pruned = Sources.bloomPrunedRead(spark, path, "source", probe)
    // a present key reads at most a couple of files (its cluster file +
    // rare false positives), never the whole table
    val filesRead = pruned.select(col("_metadata.file_path"))
      .distinct().count()
    assert(filesRead <= 2, s"expected <= 2 files, read $filesRead")
    // and pruning is lossless vs the full scan
    val expected = spark.read.parquet(path)
      .filter(col("source") === probe)
    assert(pruned.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(pruned).count() === 0)
    assert(expected.count() > 0)
    // an absent key prunes every file: zero rows without scanning data
    assert(Sources.bloomPrunedRead(
      spark, path, "source", "no-such-source-xyz").count() === 0)
    // IN-list probe: union of per-value candidate sets, exact results
    val probe2 = docs.select("source").distinct().orderBy("source")
      .limit(2).as[String].collect()
    val inPruned = Sources.bloomPrunedReadIn(
      spark, path, "source", probe2.toSeq)
    val inFiles = inPruned.select(col("_metadata.file_path"))
      .distinct().count()
    assert(inFiles <= 4, s"expected <= 4 files for 2 probes, read $inFiles")
    val inExpected = spark.read.parquet(path)
      .filter(col("source").isin(probe2.toSeq: _*))
    assert(inPruned.exceptAll(inExpected).count() === 0)
    assert(inExpected.exceptAll(inPruned).count() === 0)
    assert(inExpected.count() > 0)
  }

  test("writeJsonlShards: one JSONL file per shard dir, content " +
       "round-trips, re-export is byte-stable") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-jsonl").toString
    val docs = Seq(
      (1L, "alpha text", 0L), (2L, "beta text", 0L),
      (3L, "gamma text", 1L), (4L, "delta text", 1L),
      (5L, "epsilon text", 2L)
    ).toDF("doc_id", "text", "shard")
    Sources.writeJsonlShards(docs, dir, "shard", Seq("doc_id"))
    // one data file per shard=N dir
    (0L to 2L).foreach { s =>
      val files = new java.io.File(s"$dir/shard=$s")
        .listFiles().filter(_.getName.endsWith(".json"))
      assert(files.length === 1, s"shard $s: ${files.length} files")
    }
    // round trip: same rows (shard comes back as the partition column)
    val back = spark.read.json(dir)
      .select(col("doc_id").cast("long"), col("text"),
              col("shard").cast("long"))
    assert(back.exceptAll(docs).count() === 0)
    assert(docs.exceptAll(back).count() === 0)
    // byte-stable re-export (fixed within-shard order)
    def bytes(p: String): Seq[String] =
      new java.io.File(p).listFiles().filter(_.getName.endsWith(".json"))
        .sortBy(_.getName)
        .map(f => new String(
          java.nio.file.Files.readAllBytes(f.toPath))).toSeq
    val first = (0L to 2L).flatMap(s => bytes(s"$dir/shard=$s"))
    Sources.writeJsonlShards(docs, dir, "shard", Seq("doc_id"))
    val second = (0L to 2L).flatMap(s => bytes(s"$dir/shard=$s"))
    assert(first === second)
  }

  test("writeJsonlShards under skew: a planted hot shard still lands in " +
       "ONE file with byte-deterministic content ordering") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-jsonl-skew").toString
    // hot shard 0 carries 20k rows — orders of magnitude more than the
    // others — and rows arrive in a scrambled, partition-spread order
    val hot = (0 until 20000).map(i => ((i * 7919L) % 20000L,
                                        s"doc-${(i * 7919L) % 20000L}", 0L))
    val cold = (20000 until 20040).map(i => (i.toLong, s"doc-$i",
                                             1L + i % 3))
    val rng = new scala.util.Random(42)
    val docs = spark.createDataFrame(
      rng.shuffle(hot ++ cold)).toDF("doc_id", "text", "shard")
      .repartition(16)
    Sources.writeJsonlShards(docs, dir, "shard", Seq("doc_id"))
    // exactly one data file per shard dir, hot or cold
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.length === 4)
    shardDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".json"))
      assert(files.length === 1, s"${d.getName}: ${files.length} files")
    }
    // the hot shard's single file is sorted by doc_id (the declared
    // within-shard order) — byte-level determinism, not just set equality
    val hotFile = new java.io.File(s"$dir/shard=0")
      .listFiles().filter(_.getName.endsWith(".json")).head
    val ids = scala.io.Source.fromFile(hotFile).getLines()
      .map(l => "\"doc_id\":(\\d+)".r.findFirstMatchIn(l).get.group(1).toLong)
      .toSeq
    assert(ids.length === 20000)
    assert(ids === ids.sorted)
  }

  test("withKafkaMeta projects stream metadata as real columns (P3)") {
    val df = Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 17L, "x"))
      .toDF("timestamp", "offset", "value")
    val out = Sources.withKafkaMeta(df)
    assert(out.columns.toSet.contains("kafka_time"))
    assert(out.select("kafka_offset").as[Long].head() === 17L)
  }

  test("sink-side schema evolution: a later append's added column " +
       "back-fills NULL for old rows through readColumnarEvolved") {
    val dir = java.nio.file.Files.createTempDirectory("graft-evo")
      .toString + "/t"
    Sources.appendColumnar(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir, Seq("id"))
    // generation 2 arrives with a new nullable column (the decode side
    // already resolved it via the registry; the sink just appends)
    Sources.appendColumnar(
      Seq((3L, "c", "vip")).toDF("id", "v", "tier"), dir, Seq("id"))
    val evolved = Sources.readColumnarEvolved(spark, dir)
      .orderBy("id")
      .select("id", "v", "tier")
      .as[(Long, String, Option[String])].collect()
    assert(evolved === Array((1L, "a", None), (2L, "b", None),
                             (3L, "c", Some("vip"))))
  }

  test("ClickHouse DDL generator reproduces the reference shop.users " +
       "block byte-for-byte (README.md:164-177)") {
    // the reference's final-table DDL, verbatim: UInt32/UInt64 unsigned
    // narrowings, DateTime at second precision, ONLY kafka_time Nullable
    val reference =
      """CREATE TABLE shop.users
        |(
        |    user_id UInt32,
        |    username String,
        |    account_type String,
        |    updated_at DateTime,
        |    created_at DateTime,
        |    kafka_time Nullable(DateTime),
        |    kafka_offset UInt64
        |)
        |ENGINE = ReplacingMergeTree
        |ORDER BY (user_id, updated_at);""".stripMargin
    assert(ClickHouse.usersFinalDdl === reference)
    // without overrides the same schema falls back to the widened Spark
    // defaults (Int64) — and keeps the single Nullable column
    val generic = ClickHouse.createTableDdl(
      "shop.users", ClickHouse.usersFinalSchema,
      Seq("user_id", "updated_at"))
    assert(generic.contains("    user_id Int64,"))
    assert(generic.contains("    kafka_time Nullable(DateTime),"))
    assert(!generic.contains("Nullable(String)"))
  }

  test("ClickHouse Kafka-engine table and materialized-view DDL " +
       "reproduce the reference blocks byte-for-byte (README.md:" +
       "186-203, 210-231)") {
    val kafkaRef =
      """CREATE TABLE kafka_shop.kafka__users
        |(
        |    user_id UInt32,
        |    username String,
        |    account_type String,
        |    updated_at UInt64,
        |    created_at UInt64
        |)
        |ENGINE = Kafka
        |SETTINGS kafka_broker_list = 'broker:29092',
        |kafka_topic_list = 'shop.public.users',
        |kafka_group_name = 'clickhouse',
        |kafka_format = 'AvroConfluent',
        |format_avro_schema_registry_url='http://schema-registry:8081';"""
        .stripMargin
    assert(ClickHouse.usersKafkaDdl === kafkaRef)
    val mvRef =
      """CREATE MATERIALIZED VIEW kafka_shop.consumer__users TO shop.users
        |(
        |    user_id UInt32,
        |    username String,
        |    account_type String,
        |    updated_at DateTime,
        |    created_at DateTime,
        |    kafka_time Nullable(DateTime),
        |    kafka_offset UInt64
        |) AS
        |SELECT
        |    user_id,
        |    username,
        |    account_type,
        |    toDateTime(updated_at / 1000000) AS updated_at,
        |    toDateTime(created_at / 1000000) AS created_at,
        |    _timestamp AS kafka_time,
        |    _offset AS kafka_offset
        |FROM kafka_shop.kafka__users;""".stripMargin
    assert(ClickHouse.usersMvDdl === mvRef)
    // the ordered deployment runs databases first, view last
    val ddls = ClickHouse.referenceTopologyDdls
    assert(ddls.head === "CREATE DATABASE shop;")
    assert(ddls.indexOf(ClickHouse.usersFinalDdl) <
           ddls.indexOf(ClickHouse.usersMvDdl))
    assert(ddls.indexOf(ClickHouse.usersKafkaDdl) <
           ddls.indexOf(ClickHouse.usersMvDdl))
  }

  test("ClickHouse DDL generator rejects Nullable sorting-key columns " +
       "and unknown ORDER BY names") {
    val nullableKey = StructType(Seq(
      StructField("k", LongType, nullable = true),
      StructField("v", StringType, nullable = false)))
    val e1 = intercept[IllegalArgumentException] {
      ClickHouse.createTableDdl("db.t", nullableKey, Seq("k"))
    }
    assert(e1.getMessage.contains("Nullable"))
    val e2 = intercept[IllegalArgumentException] {
      ClickHouse.createTableDdl("db.t", nullableKey, Seq("missing"))
    }
    assert(e2.getMessage.contains("not in schema"))
  }

  test("ClickHouse dialect: UInt32/UInt64 widen to LongType on read, " +
       "Spark defaults map back to ClickHouse names on write") {
    val d = ClickHouse.ClickHouseDialect
    assert(d.canHandle("jdbc:clickhouse://host:8123/shop"))
    assert(!d.canHandle("jdbc:postgresql://host/db"))
    val md = new MetadataBuilder()
    // the README's declared column types, both tables (166-175, 189-196)
    assert(d.getCatalystType(java.sql.Types.INTEGER, "UInt32", 0, md)
             === Some(LongType))
    assert(d.getCatalystType(java.sql.Types.BIGINT, "UInt64", 0, md)
             === Some(LongType))
    assert(d.getCatalystType(java.sql.Types.VARCHAR, "String", 0, md)
             === Some(StringType))
    assert(d.getCatalystType(java.sql.Types.TIMESTAMP, "DateTime", 0, md)
             === Some(TimestampType))
    // Nullable(...) spelling accepted when a driver passes it through
    assert(d.getCatalystType(java.sql.Types.TIMESTAMP,
                             "Nullable(DateTime)", 0, md)
             === Some(TimestampType))
    assert(d.getCatalystType(java.sql.Types.DECIMAL, "Decimal(20, 0)",
                             0, md) === Some(DecimalType(20, 0)))
    // write direction: Spark defaults → ClickHouse type names
    assert(d.getJDBCType(LongType).map(_.databaseTypeDefinition)
             === Some("Int64"))
    assert(d.getJDBCType(TimestampType).map(_.databaseTypeDefinition)
             === Some("DateTime"))
    assert(d.getJDBCType(StringType).map(_.databaseTypeDefinition)
             === Some("String"))
    assert(d.getJDBCType(BooleanType).map(_.databaseTypeDefinition)
             === Some("UInt8"))
    assert(d.quoteIdentifier("from") === "`from`")
  }

  test("ClickHouse dialect Array types: the embedding-table shape " +
       "round-trips both directions; Nullable(Array(...)) fails with " +
       "the clear error") {
    val d = ClickHouse.ClickHouseDialect
    val md = new MetadataBuilder()
    // read direction: the engine's embedding store column
    assert(d.getCatalystType(java.sql.Types.ARRAY, "Array(Float32)", 0, md)
             === Some(ArrayType(FloatType, containsNull = false)))
    // null ELEMENTS arrive as Array(Nullable(T))
    assert(d.getCatalystType(java.sql.Types.ARRAY,
                             "Array(Nullable(Float32))", 0, md)
             === Some(ArrayType(FloatType, containsNull = true)))
    // nested arrays recurse
    assert(d.getCatalystType(java.sql.Types.ARRAY,
                             "Array(Array(Int64))", 0, md)
             === Some(ArrayType(ArrayType(LongType, containsNull = false),
                                containsNull = false)))
    // write direction mirrors all three
    assert(d.getJDBCType(ArrayType(FloatType, containsNull = false))
             .map(_.databaseTypeDefinition) === Some("Array(Float32)"))
    assert(d.getJDBCType(ArrayType(FloatType, containsNull = true))
             .map(_.databaseTypeDefinition)
             === Some("Array(Nullable(Float32))"))
    assert(d.getJDBCType(
               ArrayType(ArrayType(LongType, containsNull = false),
                         containsNull = false))
             .map(_.databaseTypeDefinition) === Some("Array(Array(Int64))"))
    // Nullable(Array(...)) has no legal ClickHouse spelling: a nested
    // array with null elements stays unmapped...
    assert(d.getJDBCType(
      ArrayType(ArrayType(LongType), containsNull = true)).isEmpty)
    // ...and struct columns still fail with the clear DDL error
    assert(d.getJDBCType(StructType(Seq(
      StructField("a", LongType)))).isEmpty)
  }

  test("ClickHouse dialect Map types: the events-props shape " +
       "round-trips both directions; illegal key/value shapes stay " +
       "unmapped") {
    val d = ClickHouse.ClickHouseDialect
    val md = new MetadataBuilder()
    // read direction: CH Map(String, String) → Spark MapType
    assert(d.getCatalystType(java.sql.Types.OTHER,
                             "Map(String, String)", 0, md)
             === Some(MapType(StringType, StringType,
                              valueContainsNull = false)))
    // Nullable VALUES arrive as Map(K, Nullable(V))
    assert(d.getCatalystType(java.sql.Types.OTHER,
                             "Map(String, Nullable(Int64))", 0, md)
             === Some(MapType(StringType, LongType,
                              valueContainsNull = true)))
    // nested parameterized value types split on the TOP-LEVEL comma
    assert(d.getCatalystType(java.sql.Types.OTHER,
                             "Map(String, Decimal(10, 2))", 0, md)
             === Some(MapType(StringType, DecimalType(10, 2),
                              valueContainsNull = false)))
    // Nullable KEYS have no legal CH spelling
    assert(d.getCatalystType(java.sql.Types.OTHER,
                             "Map(Nullable(String), Int64)", 0, md)
             .isEmpty)
    // write direction mirrors
    assert(d.getJDBCType(MapType(StringType, StringType,
                                 valueContainsNull = false))
             .map(_.databaseTypeDefinition)
             === Some("Map(String, String)"))
    assert(d.getJDBCType(MapType(StringType, LongType,
                                 valueContainsNull = true))
             .map(_.databaseTypeDefinition)
             === Some("Map(String, Nullable(Int64))"))
    // CH restricts map KEYS to string/integer/date-time types
    assert(d.getJDBCType(MapType(DoubleType, StringType)).isEmpty)
    // Nullable(Map(...))-valued VALUES (collection value with nulls)
    // have no legal spelling
    assert(d.getJDBCType(MapType(StringType,
                                 MapType(StringType, StringType),
                                 valueContainsNull = true)).isEmpty)
  }

  test("ClickHouse DDL: an embeddings table declares Array(Float32) " +
       "and a nullable array column is rejected with the empty-array " +
       "guidance") {
    val emb = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false),
                  nullable = false)))
    val ddl = ClickHouse.createTableDdl("shop.embeddings", emb,
                                        Seq("vec_id"))
    assert(ddl ===
      """CREATE TABLE shop.embeddings
        |(
        |    vec_id Int64,
        |    embedding Array(Float32)
        |)
        |ENGINE = ReplacingMergeTree
        |ORDER BY (vec_id);""".stripMargin)
    val nullableArr = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false),
                  nullable = true)))
    val e = intercept[IllegalArgumentException] {
      ClickHouse.createTableDdl("shop.embeddings", nullableArr,
                                Seq("vec_id"))
    }
    assert(e.getMessage.contains("empty collection"))
    // unsupported column types keep the clear no-mapping error
    val structCol = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("m", StructType(Seq(StructField("a", LongType))),
                  nullable = false)))
    val e2 = intercept[IllegalArgumentException] {
      ClickHouse.createTableDdl("shop.embeddings", structCol,
                                Seq("vec_id"))
    }
    assert(e2.getMessage.contains("no ClickHouse mapping"))
  }

  test("ClickHouse DDL: an events-props table declares " +
       "Map(String, String) and a nullable map column is rejected " +
       "with the empty-collection guidance") {
    val props = StructType(Seq(
      StructField("event_id", LongType, nullable = false),
      StructField("props", MapType(StringType, StringType,
                                   valueContainsNull = false),
                  nullable = false)))
    val ddl = ClickHouse.createTableDdl("shop.event_props", props,
                                        Seq("event_id"))
    assert(ddl ===
      """CREATE TABLE shop.event_props
        |(
        |    event_id Int64,
        |    props Map(String, String)
        |)
        |ENGINE = ReplacingMergeTree
        |ORDER BY (event_id);""".stripMargin)
    val nullableMap = StructType(Seq(
      StructField("event_id", LongType, nullable = false),
      StructField("props", MapType(StringType, StringType),
                  nullable = true)))
    val e = intercept[IllegalArgumentException] {
      ClickHouse.createTableDdl("shop.event_props", nullableMap,
                                Seq("event_id"))
    }
    assert(e.getMessage.contains("empty collection"))
  }

  test("truncateToDateTimeGrid snaps timestamps to the second grid " +
       "DateTime stores, leaving other columns untouched") {
    val df = Seq((1L, java.sql.Timestamp.valueOf("2024-05-01 10:20:30.123456"),
                  "x"))
      .toDF("id", "ts", "v")
    val got = ClickHouse.truncateToDateTimeGrid(df)
      .as[(Long, java.sql.Timestamp, String)].head()
    assert(got === ((1L, java.sql.Timestamp.valueOf("2024-05-01 10:20:30"),
                     "x")))
    // the micros the reference MV's toDateTime(x / 1000000) drops
    // (README.md:226-227) are dropped here too — same grid
  }
}
