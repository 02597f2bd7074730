package graft

import java.io.ByteArrayInputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.DecoderFactory
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink layer (SURVEY.md §2.1, S1-S8) — the Spark re-expression of
  * the reference pipeline's edges:
  *
  *  - S1  JDBC snapshot ≙ Debezium `"snapshot.mode": "initial"`
  *    (`/root/reference/README.md:137`), parallelized by partition column
  *    (the reference runs `"tasks.max": "1"`, `README.md:144` — we
  *    partition instead, the 100 TB requirement).
  *  - S3  Kafka stream ≙ the ClickHouse `ENGINE = Kafka` table
  *    (`README.md:197-202`).
  *  - S4  Confluent wire format (magic 0x0 + 4-byte schema id + Avro body;
  *    `README.md:201-202`, jar `kafka-avro-serializer-7.6.1.jar`): header
  *    strip/id extraction as Column expressions; Avro body decode via the
  *    core Avro library (flat records — the shape Debezium's
  *    ExtractNewRecordState emits).
  *  - S5  CDC envelope unwrap ≙ ExtractNewRecordState SMT
  *    (`README.md:142-143`), deletes surfaced as op='d' tombstones.
  *  - S7/S8  columnar append + JDBC sink (`README.md:212`, `config.xml:30`).
  *  - S9  REST ingest ≙ the Kafka REST Proxy edge (`docker-compose.yml:
  *    104-116`, `README.md:253`) — [[restConsumeWithCursor]] /
  *    [[restProduce]], protocol client in [[RestProxy]].
  */
object Sources {

  /** S1: parallel JDBC snapshot of one table (Debezium initial snapshot,
    * scoped like `table.include.list`, `README.md:136-137`).
    */
  def jdbcSnapshot(spark: SparkSession, url: String, table: String,
                   partitionColumn: String, lowerBound: Long, upperBound: Long,
                   numPartitions: Int,
                   props: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
    props.foldLeft(r)((b, kv) => b.option(kv._1, kv._2)).load()
  }

  /** S1 at scale: parallel JDBC snapshot with RANK-BALANCED partition
    * bounds — the batch twin of [[JdbcCdcSource]]'s range planner (ONE
    * planner for both: this method delegates to
    * `JdbcMicroBatchStream.splitBoundaries`, so batch snapshot and
    * streaming backlog drain split identically). [[jdbcSnapshot]]'s
    * value-arithmetic `lowerBound`/`upperBound` splits skew badly on
    * sparse keys (a timestamp column with a 90/10 hot-cold split puts
    * ~everything in one partition); here each boundary is found by
    * value-bisection with COUNT-BOUNDED probes — index-served
    * server-side, each walking at most ~n/numPartitions entries, row
    * data never touching the driver — so every partition carries ±1
    * rank step of n/numPartitions rows whatever the key distribution,
    * and the PLANNING phase itself costs O(n·log(range)) index entries
    * (not the O(n·p/2) an OFFSET-rank probe per boundary would — see
    * `splitBoundaries`). That is the shape a 1000-executor initial
    * snapshot needs: equal-work tasks, no straggler partition, and a
    * planner that doesn't walk the table p/2 times before the first
    * task launches.
    */
  def jdbcSnapshotBalanced(spark: SparkSession, url: String, table: String,
                           partitionColumn: String, numPartitions: Int,
                           props: Map[String, String] = Map.empty)
      : DataFrame = {
    val conf = JdbcCdcConf(
      url = url, table = table, cursorColumn = partitionColumn,
      numPartitions = numPartitions, maxRowsPerBatch = None, lagWindow = 0L,
      startingCursor = "earliest", user = props.get("user"),
      password = props.get("password"), driver = props.get("driver"))
    val schema = JdbcCdcSource.withConnection(conf)(
      JdbcCdcSource.inferSchema(_, conf))
    val cursor = JdbcCdcSource.resolveCursor(schema, partitionColumn)
    val cSql = JdbcCdcSource.q(cursor)
    def scalar(sql: String): Option[Long] =
      JdbcCdcSource.withConnection(conf) { c =>
        val st = c.createStatement()
        try {
          val rs = st.executeQuery(sql)
          rs.next()
          val v = rs.getLong(1)
          if (rs.wasNull()) None else Some(v)
        } finally st.close()
      }
    val base = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    val withProps = props.foldLeft(base)((b, kv) => b.option(kv._1, kv._2))
    (scalar(s"SELECT MIN($cSql) FROM $table"),
     scalar(s"SELECT MAX($cSql) FROM $table")) match {
      case (Some(lo), Some(hi)) if numPartitions > 1 =>
        val stream = new JdbcMicroBatchStream(conf, schema)
        // (lo-1, hi] so the minimum row is inside the first range
        val bounds = stream.splitBoundaries(lo - 1, hi)
        val los = (lo - 1) +: bounds
        val his = bounds :+ hi
        val predicates = los.zip(his).collect {
          case (l, h) if l < h => s"$cSql > $l AND $cSql <= $h"
        }
        val p = new java.util.Properties()
        props.foreach { case (k, v) => p.setProperty(k, v) }
        spark.read.jdbc(url, table, predicates.toArray, p)
      case _ => withProps.load() // empty table or 1 partition: plain read
    }
  }

  /** S2 (batch side): incremental JDBC read — rows with cursor column
    * beyond the last seen value (the polling alternative to log-based CDC
    * when WAL access isn't available; Debezium's snapshot-then-stream
    * becomes snapshot-then-poll). The predicate pushes down into the
    * remote query, so each poll ships only the delta.
    */
  def jdbcIncremental(spark: SparkSession, url: String, table: String,
                      cursorColumn: String, lastSeen: Long,
                      props: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable",
              s"(SELECT * FROM $table WHERE $cursorColumn > $lastSeen) t")
    props.foldLeft(r)((b, kv) => b.option(kv._1, kv._2)).load()
  }

  /** [[decodeConfluent]] with a dead-letter path instead of fail-the-batch
    * semantics: rows that can't decode (bad framing, unknown schema id,
    * incompatible writer, malformed body) come back with null fields and
    * the failure in a `__error` column, so one poisoned message doesn't
    * stall the pipeline — filter `__error IS NOT NULL` into a quarantine
    * sink and keep consuming (the PERMISSIVE-mode contract of Spark's
    * own file sources, applied to the registry decode path).
    */
  def decodeConfluentSafe(df: DataFrame, value: Column, registry: SchemaById,
                          readerSchemaJson: String,
                          schema: StructType): DataFrame = {
    val outSchema = schema.add(StructField("__error", StringType))
    val bytesDf = df.select(value.cast("binary").as("__value"))
    bytesDf.mapPartitions { rows =>
      val readerSchema = new Schema.Parser().parse(readerSchemaJson)
      // failures cached alongside successes: a hot poisoned id costs one
      // registry round-trip per partition, not one per row
      val readers = scala.collection.mutable
        .Map.empty[Int, Either[String, GenericDatumReader[GenericRecord]]]
      val decoderFactory = DecoderFactory.get()
      val nulls = Seq.fill(schema.fields.length)(null)
      rows.map { r =>
        try {
          val bytes = r.getAs[Array[Byte]](0)
          require(bytes != null && bytes.length > 5 && bytes(0) == 0,
                  "not a Confluent-framed message (magic byte != 0)")
          val id = java.nio.ByteBuffer.wrap(bytes, 1, 4).getInt
          val reader = readers.getOrElseUpdate(id,
            try {
              val writer = new Schema.Parser().parse(registry(id))
              val problems = schemaIncompatibilities(writer, readerSchema)
              if (problems.nonEmpty)
                Left(s"schema id $id is incompatible with the reader " +
                     s"schema: ${problems.mkString("; ")}")
              else Right(new GenericDatumReader[GenericRecord](writer,
                                                               readerSchema))
            } catch {
              case scala.util.control.NonFatal(e) =>
                Left(s"${e.getClass.getSimpleName}: ${e.getMessage}")
            }
          ).fold(msg => throw new IllegalStateException(msg), identity)
          val dec = decoderFactory.binaryDecoder(bytes, 5, bytes.length - 5,
                                                 null)
          Row.fromSeq(avroToRow(reader.read(null, dec), schema).toSeq :+ null)
        } catch {
          case scala.util.control.NonFatal(e) =>
            Row.fromSeq(nulls :+ s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    }(RowEncoder.encoderFor(outSchema)).toDF()
  }

  /** S1→S2 handoff: snapshot bounded at the source's CURRENT cursor
    * high-water mark, returned together with that cursor so the first
    * incremental poll starts exactly where the snapshot ended — the
    * polling re-expression of Debezium's snapshot-then-stream offset
    * continuity (`/root/reference/README.md:137`: `snapshot.mode=initial`
    * hands off to WAL streaming at the snapshot's recorded position).
    * Both sides predicate on the same server-side cursor comparison, so a
    * row committed after the bound lands in the first poll and never in
    * both. Returns `None` cursor for an empty table (first poll then uses
    * `Long.MinValue`).
    */
  def snapshotWithCursor(spark: SparkSession, url: String, table: String,
                         cursorColumn: String,
                         props: Map[String, String] = Map.empty)
      : (DataFrame, Option[Long]) = {
    val boundReader = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", s"(SELECT max($cursorColumn) AS hi FROM $table) t")
    val boundRow = props.foldLeft(boundReader)((b, kv) => b.option(kv._1, kv._2))
      .load().head()
    val hi = if (boundRow.isNullAt(0)) None
             else Some(boundRow.getAs[Number](0).longValue())
    val snapReader = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", hi match {
        case Some(h) => s"(SELECT * FROM $table WHERE $cursorColumn <= $h) t"
        case None    => table // provably empty — plain read keeps the schema
      })
    val snap = props.foldLeft(snapReader)((b, kv) => b.option(kv._1, kv._2))
      .load()
    (snap, hi)
  }

  /** S8: JDBC sink (ClickHouse HTTP/MySQL endpoints in the reference,
    * `config.xml:11,30` — any JDBC URL here).
    */
  def jdbcSink(df: DataFrame, url: String, table: String,
               props: Map[String, String] = Map.empty): Unit = {
    val w = df.write.format("jdbc")
      .option("url", url).option("dbtable", table).mode("append")
    props.foldLeft(w)((b, kv) => b.option(kv._1, kv._2)).save()
  }

  /** S8b: idempotent JDBC UPSERT sink — the destination-side analog of
    * the reference target's ReplacingMergeTree semantics for a serving
    * RDBMS: after a write there is exactly one row per key tuple, and
    * replaying the same batch is a no-op (at-least-once delivery safe).
    *
    * Mechanics: the frame is hash-repartitioned on the key columns so
    * every row of a key lands in exactly ONE task; each task deletes its
    * keys and re-inserts inside a single local transaction. Delete+insert
    * is the dialect-portable upsert (MERGE / ON CONFLICT syntax differs
    * per engine); batches keep JDBC round trips O(rows / batchSize).
    * Callers upserting a versioned change stream should collapse to the
    * latest version per key first ([[Cdc.latest]]) — with duplicate keys
    * in one batch a primary-key constraint on the target may reject the
    * second insert.
    */
  def jdbcUpsertSink(df: DataFrame, url: String, table: String,
                     keys: Seq[String], batchSize: Int = 500): Unit = {
    val cols = df.columns.toSeq
    val keyIdx = keys.map(cols.indexOf)
    require(keyIdx.forall(_ >= 0), s"keys $keys must be columns of $cols")
    val insertSql = s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    val deleteSql = s"DELETE FROM $table WHERE " +
      keys.map(k => s"$k = ?").mkString(" AND ")
    df.repartition(keys.map(col): _*).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.hasNext) {
          val conn = java.sql.DriverManager.getConnection(url)
          try {
            conn.setAutoCommit(false)
            val del = conn.prepareStatement(deleteSql)
            val ins = conn.prepareStatement(insertSql)
            var n = 0
            rows.foreach { r =>
              keyIdx.zipWithIndex.foreach { case (ci, pi) =>
                del.setObject(pi + 1, r.get(ci))
              }
              del.addBatch()
              cols.indices.foreach(i => ins.setObject(i + 1, r.get(i)))
              ins.addBatch()
              n += 1
              if (n % batchSize == 0) { del.executeBatch(); ins.executeBatch() }
            }
            del.executeBatch(); ins.executeBatch()
            conn.commit()
            del.close(); ins.close()
          } catch {
            case e: Throwable => conn.rollback(); throw e
          } finally conn.close()
        }
    }
  }

  /** S3: Kafka micro-batch source configured like the reference's consumer
    * (topic `shop.public.users`, group `clickhouse`, earliest-onward,
    * `README.md:197-202`). Requires the spark-sql-kafka connector on the
    * cluster classpath.
    */
  def kafkaStream(spark: SparkSession, brokers: String, topic: String,
                  groupId: String): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("kafka.group.id", groupId)
      .option("startingOffsets", "earliest")
      .load()

  /** S9: REST ingest, consume side — one bounded micro-batch from the
    * Kafka REST Proxy (`/root/reference/docker-compose.yml:104-116`,
    * `README.md:253`), planned for Spark's execution model: the driver
    * pins one `[from, until)` offset range per Kafka partition from the
    * proxy's metadata endpoints (tiny, no record payloads), then each
    * range becomes one deterministic executor task reading through its
    * own ephemeral consumer instance ([[RestProxy.Client.consumeRange]]).
    * Returns the Kafka-source-shaped frame (`key`/`value` binary, `topic`,
    * `partition`, `offset`) plus the NEXT cursor — feed it back as
    * `startOffsets` for the following batch, exactly the
    * [[snapshotWithCursor]] handoff discipline. Laziness is safe: ranges
    * are pinned eagerly HERE, so records produced after this call (or
    * between this call and the action) never leak into the batch, and a
    * re-executed stage re-reads the identical slice. `maxPerPartition`
    * caps a batch's per-partition read (the cursor only advances past
    * what was read) so a deep backlog drains in bounded, spill-free
    * batches instead of one unbounded read — the 100 TB knob.
    */
  def restConsumeWithCursor(spark: SparkSession, baseUrl: String,
                            topic: String,
                            startOffsets: Map[Int, Long] = Map.empty,
                            maxPerPartition: Option[Long] = None)
      : (DataFrame, Map[Int, Long]) = {
    val (df, _, cursor) =
      restConsumeRanges(spark, baseUrl, topic, startOffsets, maxPerPartition)
    (df, cursor)
  }

  /** [[restConsumeWithCursor]] plus the batch's FROM offsets — the
    * resolved `max(beginning, committed)` per partition, which is what
    * "did this batch read anything" must be judged against: on a
    * retention-trimmed partition (beginning > 0) with no prior cursor,
    * `until == beginning ≠ 0`, and comparing against a 0 default would
    * make an idle topic look moved.
    */
  private[graft] def restConsumeRanges(
      spark: SparkSession, baseUrl: String, topic: String,
      startOffsets: Map[Int, Long] = Map.empty,
      maxPerPartition: Option[Long] = None)
      : (DataFrame, Map[Int, Long], Map[Int, Long]) = {
    val client = RestProxy.Client(baseUrl)
    val ranges = client.partitions(topic).map { p =>
      val (lo, hi) = client.offsets(topic, p)
      val from = math.max(lo, startOffsets.getOrElse(p, lo))
      val until = maxPerPartition match {
        case Some(cap) => math.min(hi, from + cap)
        case None      => hi
      }
      (p, from, until)
    }
    val cursor = ranges.map { case (p, _, until) => p -> until }.toMap
    import spark.implicits._
    val df = spark.createDataset(ranges)
      // round-robin the range rows so each Kafka partition's fetch runs
      // as its own task — parallelism = topic partitions, like the real
      // Kafka source
      .repartition(math.max(ranges.size, 1))
      .flatMap { case (p, from, until) =>
        // lazily-paginated pull: one poll's records resident at a time,
        // never the whole range — the task streams an uncapped backlog
        RestProxy.Client(baseUrl).consumeRangeIterator(topic, p, from, until)
          .map(r => (r.key, r.value, r.topic, r.partition, r.offset))
      }
      .toDF("key", "value", "topic", "partition", "offset")
    (df, ranges.map { case (p, from, _) => p -> from }.toMap, cursor)
  }

  /** S9: REST ingest, produce side (`POST /topics/{t}`, binary embedded
    * format). Placement: pass an explicit `partition` column for
    * deterministic routing, or `lit(null)` to delegate to the proxy
    * (murmur2 key hash for keyed records — Kafka's DefaultPartitioner).
    * At-least-once, like any non-transactional Kafka producer: a retried
    * task re-POSTs its slice, so downstream consumers must collapse on a
    * business key (U2/U3 — the merge discipline the reference's
    * ReplacingMergeTree target imposes anyway).
    */
  def restProduce(df: DataFrame, baseUrl: String, topic: String,
                  key: Column, value: Column,
                  partition: Column = lit(null),
                  batchSize: Int = 500): Unit =
    df.select(key.cast("binary").as("k"), value.cast("binary").as("v"),
              partition.cast("int").as("p"))
      .foreachPartition { (rows: Iterator[Row]) =>
        RestProxy.Client(baseUrl).produce(topic, rows.map { r =>
          (r.getAs[Array[Byte]](0), r.getAs[Array[Byte]](1),
           if (r.isNullAt(2)) null
           else java.lang.Integer.valueOf(r.getInt(2)))
        }, batchSize)
        ()
      }

  /** S9+T2: the persisted consume cursor for the REST ingest loop — the
    * engine-side stand-in for the consumer group's committed offsets
    * (the real proxy's `POST .../offsets`, which only lives as long as
    * the consumer instance does; a restart-safe pipeline needs its own
    * durable commit, exactly like Spark's Kafka source keeps offsets in
    * its checkpoint rather than in the group).
    *
    * Commit discipline: one fully-written versioned file published by a
    * single atomic rename (`cursor-<n>`, monotonic). Read takes the
    * HIGHEST version that PARSES — an empty or torn file (a crash
    * between create and content reaching disk) is skipped, falling back
    * to the previous commit, so the worst crash outcome is a replay of
    * one batch (at-least-once), never a skipped or half-applied cursor.
    * Older versions are pruned only AFTER a successful publish; a crash
    * mid-prune leaves extra history, never ambiguity. Single writer per
    * cursor dir (one ingest loop per topic), like any consumer group
    * member.
    */
  def readRestCursor(spark: SparkSession, dir: String): Map[Int, Long] = {
    val d = new org.apache.hadoop.fs.Path(dir)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(d)) return Map.empty
    val versions = fs.listStatus(d).toSeq
      .map(_.getPath)
      .flatMap { p =>
        p.getName match {
          case CursorName(n) => Some((n.toLong, p))
          case _             => None
        }
      }
      .sortBy(-_._1)
    versions.view.flatMap { case (_, p) =>
      try {
        val in = fs.open(p)
        val bytes = try in.readAllBytes() finally in.close()
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(bytes)
        // a committed cursor is always a non-empty JSON object; anything
        // else (zero bytes parse to a missing node, not an error) is a
        // torn publication
        if (node == null || !node.isObject || node.isEmpty) None
        else {
          import scala.jdk.CollectionConverters._
          Some(node.properties().asScala
            .map(e => e.getKey.toInt -> e.getValue.asLong()).toMap)
        }
      } catch {
        // torn/empty publication — fall back to the previous commit
        case _: Exception => None
      }
    }.headOption.getOrElse(Map.empty)
  }

  private val CursorName = "cursor-(\\d+)".r

  private[graft] def writeRestCursor(spark: SparkSession, dir: String,
                                     cursor: Map[Int, Long]): Unit = {
    val d = new org.apache.hadoop.fs.Path(dir)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prev = if (!fs.exists(d)) Seq.empty
               else fs.listStatus(d).toSeq.map(_.getPath).flatMap { p =>
                 p.getName match {
                   case CursorName(n) => Some((n.toLong, p))
                   case _             => None
                 }
               }
    val next = prev.map(_._1).maxOption.getOrElse(0L) + 1
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    cursor.toSeq.sortBy(_._1)
      .foreach { case (p, o) => node.put(p.toString, o) }
    val tmp = new org.apache.hadoop.fs.Path(d, s"_tmp_cursor_$next")
    val out = fs.create(tmp, true)
    try out.write(mapper.writeValueAsBytes(node)) finally out.close()
    // HadoopFileSystem implementations commonly report rename failure by
    // RETURNING false, not throwing — pruning after a silently failed
    // publish would delete every surviving cursor and force a
    // full-topic replay, so the failure must abort BEFORE the prune
    if (!fs.rename(tmp, new org.apache.hadoop.fs.Path(d, s"cursor-$next")))
      throw new java.io.IOException(
        s"cursor publish failed: rename $tmp -> cursor-$next returned " +
        "false; previous cursor versions left intact")
    // best-effort prune of superseded versions — read ignores them
    prev.foreach { case (_, p) =>
      try fs.delete(p, false)
      catch { case _: java.io.IOException => () }
    }
  }

  /** S9+T2: one crash-safe micro-batch of the REST ingest loop — consume
    * everything (or up to `maxPerPartition`) past the last COMMITTED
    * cursor, run `process` on it, then commit the new cursor. The commit
    * happens strictly AFTER `process` returns, so a crash anywhere in
    * the window replays the same batch from the same offsets on restart:
    * at-least-once delivery, which the store-side batch functions this
    * pairs with ([[Streaming.upsertBatch]], `idempotentAppend`, the
    * incremental-agg markers) already absorb idempotently — the same
    * contract every Kafka consumer of the reference's topics lives
    * under. An empty batch commits nothing (no cursor churn on an idle
    * loop). Returns the committed cursor.
    */
  def restIngestBatch(spark: SparkSession, baseUrl: String, topic: String,
                      cursorDir: String,
                      maxPerPartition: Option[Long] = None)
                     (process: DataFrame => Unit): Map[Int, Long] = {
    val committed = readRestCursor(spark, cursorDir)
    val (batch, from, next) =
      restConsumeRanges(spark, baseUrl, topic, committed, maxPerPartition)
    // "moved" compares until against the batch's resolved FROM offsets
    // (max(beginning, committed)), not a 0 default — on a
    // retention-trimmed partition with no prior cursor an idle topic
    // must NOT look moved ("an empty batch commits nothing")
    val moved = next.exists { case (p, until) =>
      from.getOrElse(p, until) < until
    }
    if (!moved) return committed
    process(batch)
    writeRestCursor(spark, cursorDir, next)
    next
  }

  /** S9: drain the topic's backlog in bounded crash-safe batches until a
    * batch moves no offset. Returns the number of non-empty batches run.
    */
  def restIngestDrain(spark: SparkSession, baseUrl: String, topic: String,
                      cursorDir: String, maxPerPartition: Long)
                     (process: DataFrame => Unit): Int = {
    var n = 0
    var prev = readRestCursor(spark, cursorDir)
    var moved = true
    while (moved) {
      val cur = restIngestBatch(spark, baseUrl, topic, cursorDir,
                                Some(maxPerPartition))(process)
      moved = cur != prev
      if (moved) n += 1
      prev = cur
    }
    n
  }

  /** S4: Confluent wire format — payload after the 5-byte header
    * (magic byte 0x0 + big-endian int32 schema id).
    */
  def confluentPayload(value: Column): Column =
    substring(value, 6, Int.MaxValue)

  /** S4: the big-endian schema id from bytes 2-5 of the framed message. */
  def confluentSchemaId(value: Column): Column =
    conv(hex(substring(value, 2, 4)), 16, 10).cast("int")

  /** Shared Avro GenericRecord → Row conversion: fields matched by name;
    * supported Avro types: long/int/string/double/float/boolean/bytes and
    * timestamp-micros logical longs (mapped per `schema`'s field type).
    */
  private def avroToRow(rec: GenericRecord, schema: StructType): Row =
    Row.fromSeq(schema.fields.map { f =>
      val v = if (rec.getSchema.getField(f.name) != null) rec.get(f.name)
              else null
      (v, f.dataType) match {
        case (null, _) => null
        case (x: org.apache.avro.util.Utf8, StringType) => x.toString
        case (x: java.lang.Long, TimestampType) =>
          // epoch micros (Debezium wire format, README.md:194) →
          // micro-precision Timestamp
          val t = new java.sql.Timestamp(x / 1000)
          t.setNanos(((x % 1000000) * 1000).toInt)
          t
        case (x, _) => x
      }
    }.toSeq)

  /** S4: decode flat Avro records (the post-SMT after-image shape) to rows
    * of `schema` using the core Avro runtime — executor-side, one reader
    * per partition, no driver involvement.
    */
  def decodeAvro(df: DataFrame, payload: Column, avroSchemaJson: String,
                 schema: StructType): DataFrame = {
    val bytesDf = df.select(payload.cast("binary").as("__payload"))
    bytesDf.mapPartitions { rows =>
      val avroSchema = new Schema.Parser().parse(avroSchemaJson)
      val reader = new GenericDatumReader[GenericRecord](avroSchema)
      val decoderFactory = DecoderFactory.get()
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](0)
        val dec = decoderFactory.binaryDecoder(
          new ByteArrayInputStream(bytes), null)
        avroToRow(reader.read(null, dec), schema)
      }
    }(RowEncoder.encoderFor(schema)).toDF()
  }

  /** S4: schema lookup by registry id — the contract behind Confluent's
    * `GET /schemas/ids/{id}` that the reference's consumers perform per
    * message batch (`/root/reference/README.md:201-202`, `:138-141`).
    * Implementations must be serializable: lookups run executor-side.
    */
  trait SchemaById extends Serializable {
    /** The writer schema JSON registered under `id`. */
    def apply(id: Int): String
  }

  /** Static id→schema registry: tests, frozen deployments, or a
    * pre-fetched snapshot of the real registry shipped with the job.
    */
  final case class StaticSchemaRegistry(schemas: Map[Int, String])
      extends SchemaById {
    def apply(id: Int): String = schemas.getOrElse(id,
      throw new NoSuchElementException(s"schema id $id not in registry"))
  }

  /** Confluent Schema Registry REST client
    * (`GET {baseUrl}/schemas/ids/{id}` → `{"schema": "<json>"}`), with a
    * per-JVM cache so each executor fetches a given id at most once —
    * the access pattern the reference's serializer jar implements
    * (`kafka-avro-serializer`, `README.md:202`).
    */
  final case class HttpSchemaRegistry(baseUrl: String) extends SchemaById {
    @transient private lazy val cache =
      new java.util.concurrent.ConcurrentHashMap[Int, String]()
    def apply(id: Int): String =
      cache.computeIfAbsent(id, fetch(_))
    private def fetch(id: Int): String = {
      val conn = new java.net.URL(s"$baseUrl/schemas/ids/$id")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(10000)
      try {
        val body = new String(conn.getInputStream.readAllBytes(),
                              java.nio.charset.StandardCharsets.UTF_8)
        new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(body).get("schema").asText()
      } finally conn.disconnect()
    }
  }

  /** S4/§2.1: Avro reader/writer compatibility verdict — the check the
    * reference's Schema Registry performs when a producer registers a new
    * generation (`/root/reference/README.md:260`), re-expressed on the
    * consumer side with Avro's own resolution rules
    * (`org.apache.avro.SchemaCompatibility`). Empty result = `reader`
    * can read data written with `writer`.
    */
  def schemaIncompatibilities(writer: Schema, reader: Schema): Seq[String] = {
    import scala.jdk.CollectionConverters._
    org.apache.avro.SchemaCompatibility
      .checkReaderWriterCompatibility(reader, writer)
      .getResult.getIncompatibilities.asScala.toSeq
      .map(i => s"${i.getType} at ${i.getLocation}: ${i.getMessage}")
  }

  /** True iff data written with `writerJson` is readable as `readerJson`
    * (BACKWARD compatibility in registry terms).
    */
  def compatible(writerJson: String, readerJson: String): Boolean =
    schemaIncompatibilities(new Schema.Parser().parse(writerJson),
                            new Schema.Parser().parse(readerJson)).isEmpty

  /** S4 end-to-end: decode Confluent-framed messages (magic 0x0 +
    * big-endian schema id + Avro body) resolving each row's WRITER schema
    * through `registry` and reading with `readerSchemaJson` — Avro schema
    * resolution handles evolution (added-with-default / removed fields),
    * so one stream can carry several schema generations, the exact
    * situation the reference's registry-checked producers create
    * (`README.md:260`). Per-partition reader cache: one registry lookup
    * and one resolving reader per distinct schema id per partition.
    */
  def decodeConfluent(df: DataFrame, value: Column, registry: SchemaById,
                      readerSchemaJson: String,
                      schema: StructType): DataFrame = {
    val bytesDf = df.select(value.cast("binary").as("__value"))
    bytesDf.mapPartitions { rows =>
      val readerSchema = new Schema.Parser().parse(readerSchemaJson)
      val readers =
        scala.collection.mutable.Map.empty[Int, GenericDatumReader[GenericRecord]]
      val decoderFactory = DecoderFactory.get()
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](0)
        require(bytes.length > 5 && bytes(0) == 0,
                "not a Confluent-framed message (magic byte != 0)")
        val id = java.nio.ByteBuffer.wrap(bytes, 1, 4).getInt
        val reader = readers.getOrElseUpdate(id, {
          val writer = new Schema.Parser().parse(registry(id))
          // enforce the registry's compatibility contract at reader
          // construction — a clear verdict per schema id instead of an
          // obscure Avro resolution failure mid-stream
          val problems = schemaIncompatibilities(writer, readerSchema)
          if (problems.nonEmpty)
            throw new IllegalStateException(
              s"schema id $id is incompatible with the reader schema: " +
              problems.mkString("; "))
          new GenericDatumReader[GenericRecord](writer, readerSchema)
        })
        val dec = decoderFactory.binaryDecoder(bytes, 5, bytes.length - 5, null)
        avroToRow(reader.read(null, dec), schema)
      }
    }(RowEncoder.encoderFor(schema)).toDF()
  }

  /** S5: unwrap a Debezium-style envelope struct column
    * `{before, after, op, ts_ms}` to after-image rows; deletes (null
    * after) become tombstones carrying the before-image key so the CDC
    * latest-state view can drop the entity (SURVEY.md §7.5).
    */
  def unwrapCdc(df: DataFrame, envelope: String = "envelope"): DataFrame = {
    val e = col(envelope)
    df.withColumn("op", e.getField("op"))
      .withColumn("__img",
        when(e.getField("op") === "d", e.getField("before"))
          .otherwise(e.getField("after")))
      .select(col("__img.*"), col("op"))
  }

  /** P3: surface Kafka virtual columns as real columns (`_timestamp AS
    * kafka_time`, `_offset AS kafka_offset`, `README.md:228-229,173-174`).
    */
  def withKafkaMeta(df: DataFrame): DataFrame =
    df.withColumn("kafka_time", col("timestamp"))
      .withColumn("kafka_offset", col("offset"))

  /** Small-file compaction for an append-only hive-partitioned store
    * (each micro-batch append adds files; thousands of batches → listing
    * and task-scheduling overhead dominates reads). Rewrites each
    * partition's rows into ONE file (hash-clustering on the partition
    * column puts a hive partition's rows in a single task) via dynamic
    * partition overwrite — content-identical, same layout, one run
    * amortizes across all subsequent reads. Quiesce writers first, as
    * any compactor must.
    */
  // Bloom skip-index geometry: 1024 bits (16 longs) per file, 4 probes.
  // At ~100 distinct keys per file the load is ~33 % ⇒ false-positive
  // rate ~1 % — a false positive only costs reading one extra file.
  private val BloomWords = 16
  private val BloomProbes = 4

  private def bloomPositions(value: Column): Seq[Column] =
    (0 until BloomProbes).map { k =>
      pmod(xxhash64(lit(k), value), lit(BloomWords * 64L))
    }

  /** MergeTree skip-index analog, bloom_filter variant (the reference's
    * destination engine attaches `INDEX … TYPE bloom_filter` to skip
    * granules whose indexed column can't contain a literal; here the
    * skip unit is the FILE, next to the min/max pruning a clustered
    * write already gives). Writes `df` hash-clustered on `indexCol`
    * into `numFiles` files, then builds a sidecar index table at
    * `<path>__bloomidx` with one row per (data file, bloom word):
    * 1024 bits per file over 4 xxhash64 probes per value — built
    * relationally (explode positions → bit_or per word), never
    * driver-side. The sidecar is O(files × 16) rows — metadata-sized,
    * like any skip index.
    */
  def writeBloomIndexed(df: DataFrame, path: String, indexCol: String,
                        numFiles: Int): Unit = {
    val spark = df.sparkSession
    df.repartition(numFiles, col(indexCol))
      .write.mode("overwrite").parquet(path)
    val written = spark.read.parquet(path)
      .select(col("_metadata.file_path").as("file"), col(indexCol).as("v"))
    written
      .select(col("file"),
              explode(array(bloomPositions(col("v")): _*)).as("pos"))
      .select(col("file"), (col("pos") / 64).cast("int").as("word"),
              expr("shiftleft(1L, CAST(pos % 64 AS INT))").as("bit"))
      .groupBy("file", "word").agg(bit_or(col("bit")).as("bits"))
      .write.mode("overwrite").parquet(path + "__bloomidx")
  }

  /** Point-lookup read through the bloom skip index: compute the
    * literal's 4 probe positions, collect the metadata-sized sidecar to
    * the driver (file-listing decisions are driver-side in every engine
    * — this is partition pruning's sibling), keep only files whose
    * bloom contains ALL probe bits, and scan just those with the exact
    * predicate re-applied (bloom false positives are filtered, never
    * returned). An absent value typically prunes every file ⇒ the scan
    * reads nothing.
    */
  def bloomPrunedRead(spark: SparkSession, path: String, indexCol: String,
                      value: Any): DataFrame =
    bloomPrunedReadIn(spark, path, indexCol, Seq(value))

  /** IN-list form of the bloom-pruned read: candidate files = the UNION
    * of each literal's qualifying set (a file survives if its bloom
    * contains ALL probe bits of AT LEAST ONE value), then one scan of
    * the candidates with the exact IN predicate. Probe-position hashing
    * runs as one tiny local job per literal — driver-bounded by the
    * IN-list length, like any IN-list partition pruning.
    */
  def bloomPrunedReadIn(spark: SparkSession, path: String,
                        indexCol: String, values: Seq[Any]): DataFrame = {
    // Probe literals MUST hash at the indexed column's stored type:
    // xxhash64 is type-sensitive, so an Int probe against a LongType
    // index would light different bit positions and silently prune
    // files that DO contain the value. The write side hashed the
    // column at its native parquet type; cast every probe to match.
    val indexedType = spark.read.parquet(path).schema(indexCol).dataType
    val idx = spark.read.parquet(path + "__bloomidx")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val byFile = idx.groupBy(_._1)
    val candidates = values.flatMap { value =>
      val probes = spark.range(1)
        .select(bloomPositions(lit(value).cast(indexedType)).zipWithIndex
          .map { case (c, i) => c.as(s"p$i") }: _*)
        .collect()(0)
      val masks = (0 until BloomProbes).map(i => probes.getLong(i))
        .groupBy(p => (p / 64).toInt)
        .map { case (w, ps) => w -> ps.map(p => 1L << (p % 64).toInt)
                 .reduce(_ | _) }
      byFile.collect {
        case (file, rows)
            if masks.forall { case (w, m) =>
              rows.exists(r => r._2 == w && (r._3 & m) == m) } => file
      }
    }.distinct
    if (candidates.isEmpty)
      spark.read.parquet(path).filter(lit(false))
    else
      spark.read.parquet(candidates: _*)
        .filter(col(indexCol).isin(values: _*))
  }

  /** Data files under `dir` (recursive, Hadoop FS API — works on any
    * supported filesystem, not just local). Success markers / hidden
    * files excluded. The trigger metric for store compaction: an
    * append-only store's read cost grows with its file count, not its
    * byte size.
    */
  def dataFileCount(spark: SparkSession, dir: String): Long = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) 0L
    else {
      val it = fs.listFiles(path, true)
      var n = 0L
      while (it.hasNext) {
        val name = it.next().getPath.getName
        if (!name.startsWith("_") && !name.startsWith(".")) n += 1
      }
      n
    }
  }

  private[graft] val CompactTmpSuffix = ".compact.tmp"

  /** Completeness seal for the compaction tmp: created INSIDE the tmp
    * only after the parquet write AND the marker copy finished, so its
    * presence — not the live dir's existence — is the proof the tmp is
    * promotable. `fs.delete(liveDir)` is not atomic on local FS or
    * object stores: a crash mid-delete leaves a PARTIAL live dir next
    * to the complete tmp, and a recovery that trusted "live exists ⇒
    * live complete" would drop the only complete copy.
    */
  private[graft] val CompactCompleteTag = "_graft_compact_complete"

  def compactPartitionedDir(spark: SparkSession, dir: String,
                            partitionCol: String): Unit = {
    // whole-dir tmp→rename swap, NOT an in-place dynamic overwrite: the
    // in-place commit deletes each target partition dir before renaming
    // its replacement in, so a crash inside that window LOSES the
    // partition outright — and compaction runs after the batch marker,
    // so nothing would ever retry it. With the swap + the
    // [[CompactCompleteTag]] seal, a crash leaves either the complete
    // old dir (tmp unsealed → dropped) or a sealed complete tmp;
    // [[recoverCompactedDir]] (called by consumers before reading, and
    // here on entry) promotes a sealed tmp — finishing the live-dir
    // delete if the crash tore it — and discards an unsealed one.
    val p = new org.apache.hadoop.fs.Path(dir)
    val tmp = new org.apache.hadoop.fs.Path(dir + CompactTmpSuffix)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a prior compaction may have crashed mid-swap: promote/discard its
    // tmp BEFORE reading (reading a half-deleted live dir would bake
    // the loss into the new compacted copy)
    recoverCompactedDir(spark, dir)
    val current = spark.read.parquet(dir)
      .repartition(col(partitionCol))
      .localCheckpoint() // cut the scan lineage: we replace the source
    if (fs.exists(tmp)) fs.delete(tmp, true)
    current.write.mode("overwrite")
      .partitionBy(partitionCol)
      .parquet(tmp.toString)
    // the store dir may ALSO hold the sink's _graft_commits replay
    // markers (the incremental agg/sketch sinks compact the same dir
    // their markers live in) — the swap must carry them across or a
    // post-compaction crash replays every batch the markers recorded,
    // double-counting additive state. COPY (not move) so a crash
    // before the delete leaves the original dir fully intact.
    val markers = new org.apache.hadoop.fs.Path(p, "_graft_commits")
    if (fs.exists(markers))
      org.apache.hadoop.fs.FileUtil.copy(
        fs, markers, fs,
        new org.apache.hadoop.fs.Path(tmp, "_graft_commits"),
        false, spark.sparkContext.hadoopConfiguration)
    // seal LAST, after data + markers — from here on the tmp, not the
    // live dir, is the authoritative copy
    fs.create(new org.apache.hadoop.fs.Path(tmp, CompactCompleteTag),
              true).close()
    fs.delete(p, true)
    fs.rename(tmp, p)
    // best-effort hygiene: the seal rode the rename into the live dir;
    // underscore-prefixed so readers ignore it either way
    fs.delete(new org.apache.hadoop.fs.Path(p, CompactCompleteTag), false)
  }

  /** Crash recovery for [[compactPartitionedDir]]'s swap — call before
    * reading a compacted store. A SEALED tmp (carries
    * [[CompactCompleteTag]]) is complete and strictly as-new-as the
    * live dir, while the live dir may be HALF-DELETED (fs.delete is
    * not atomic) — so a sealed tmp is promoted unconditionally: finish
    * deleting whatever remains of the live dir, then rename. An
    * unsealed tmp is a torn compaction write; the live dir is still
    * fully intact (the seal precedes the delete), so drop the tmp —
    * reading both would double every row. Unsealed tmp with NO live
    * dir only arises for stores written before the seal existed;
    * promote it as the only copy (the pre-seal recovery semantics).
    */
  private[graft] def recoverCompactedDir(spark: SparkSession,
                                         dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val tmp = new org.apache.hadoop.fs.Path(dir + CompactTmpSuffix)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(tmp)) {
      val tmpSealed =
        fs.exists(new org.apache.hadoop.fs.Path(tmp, CompactCompleteTag))
      if (tmpSealed) {
        if (fs.exists(p)) fs.delete(p, true)
        fs.rename(tmp, p)
        fs.delete(new org.apache.hadoop.fs.Path(p, CompactCompleteTag),
                  false)
      } else if (fs.exists(p)) fs.delete(tmp, true)
      else fs.rename(tmp, p)
    }
  }

  /** S7: columnar append sink (the MV's `TO shop.users` insert,
    * `README.md:212`), clustered like the reference's ORDER BY for
    * min/max-stat row-group skipping (`README.md:177`). `partitionCols`
    * become hive-style directory partitions — at 100 TB the partition
    * column (day, tenant, language, ...) is what lets a query touch 1/nth
    * of the files (static + dynamic partition pruning).
    */
  def appendColumnar(df: DataFrame, path: String,
                     sortCols: Seq[String],
                     partitionCols: Seq[String] = Nil): Unit = {
    val w = df.sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("append")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }

  /** S7 schema evolution on the sink side — the ClickHouse
    * `ALTER TABLE ... ADD COLUMN` analog for a parquet destination: when
    * an upstream schema generation adds a nullable column (the registry
    * evolution [[decodeConfluent]] already handles on the DECODE side),
    * newer appends simply carry the extra column and the unified read
    * merges every file footer (`mergeSchema`), back-filling NULL for
    * pre-evolution rows. Spark's default read takes ONE footer as the
    * schema — correct and cheap for a stable schema, silently dropping
    * new columns after an evolution — so evolved tables must read
    * through this entry point. At 100 TB keep using it only until the
    * next compaction rewrites old partitions to the current schema:
    * footer-merging lists every file's metadata.
    */
  def readColumnarEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Training-shard export: JSON-lines files hive-partitioned by the
    * shard column — the delivery format of a data-prep pipeline (each
    * `shard=N/` directory is one training shard of newline-delimited
    * JSON docs, the shape `q_pack_shards` assigns). `repartition` on the
    * shard key gives one task — and hence one file — per shard;
    * `sortCols` fixes the within-shard document order so re-exports are
    * byte-stable PROVIDED (shardCol ++ sortCols) orders rows uniquely —
    * with ties (e.g. sorting by a non-unique quality score) the tie
    * order is shuffle-arrival-dependent and stability is lost; include
    * a unique id as the final sort column.
    */
  def writeJsonlShards(df: DataFrame, path: String, shardCol: String,
                       sortCols: Seq[String]): Unit =
    df.repartition(col(shardCol))
      .sortWithinPartitions((shardCol +: sortCols).map(col): _*)
      .write.mode("overwrite")
      .partitionBy(shardCol)
      .json(path)
}
