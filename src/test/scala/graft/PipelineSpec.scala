package graft

import java.io.ByteArrayOutputStream
import java.nio.file.Files

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference pipeline end-to-end inside Spark, as one streaming job:
  *
  *   Kafka topic of Confluent-framed Avro change events (simulated with
  *   MemoryStream[Array[Byte]])                        [S3, README:197-202]
  *   → 5-byte header strip + Avro decode               [S4, README:138-141]
  *   → MV transform (epoch-micros → second timestamps) [T1, README:222-230]
  *   → upsert-on-batch into the columnar final store   [U1, README:176-177]
  *   → latest-state read returns the reference demo's expected result
  *     (3 users, user2 upgraded to Gold; duplicate delivery collapsed)
  *                                                     [README:108-114,240]
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val avroSchemaJson =
    """{"type":"record","name":"users","fields":[
      |{"name":"user_id","type":"long"},
      |{"name":"username","type":["null","string"],"default":null},
      |{"name":"account_type","type":["null","string"],"default":null},
      |{"name":"updated_at","type":"long"}]}""".stripMargin

  private val decodedSchema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("username", StringType),
    StructField("account_type", StringType),
    StructField("updated_at", LongType)))

  private def frame(id: Long, name: String, acct: String,
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
    Array[Byte](0, 0, 0, 0, 7) ++ out.toByteArray
  }

  test("reference loop: framed Avro stream -> decode -> MV -> upsert -> " +
       "latest state matches the demo") {
    implicit val sqlCtx = spark.sqlContext
    val state = Files.createTempDirectory("graft-pipe").toString + "/users"
    val ckpt = Files.createTempDirectory("graft-pipe-ckpt").toString
    val stream = MemoryStream[Array[Byte]]

    val decoded = Sources.decodeAvro(
      stream.toDF().toDF("value"),
      Sources.confluentPayload(col("value")), avroSchemaJson, decodedSchema)
    val transformed = Streaming.mvTransform(decoded, Seq.empty)
      .withColumn("updated_ts",
                  Functions.microsToTimestampSecond(col("updated_at")))
    val q = Streaming.upsertSink(transformed, state, ckpt,
                                 Seq("user_id"), Seq("updated_at")).start()

    // batch 1: the 3 seed inserts (README.md:108-112)
    stream.addData(Seq(frame(1, "user1", "Bronze", 1000000L),
                       frame(2, "user2", "Silver", 1000000L),
                       frame(3, "user3", "Gold", 1000000L)))
    q.processAllAvailable()
    // batch 2: user2 upgraded + at-least-once duplicate delivery
    stream.addData(Seq(frame(2, "user2", "Gold", 2000000L),
                       frame(2, "user2", "Gold", 2000000L)))
    q.processAllAvailable()
    q.stop()

    val finalState = spark.read.parquet(state)
      .orderBy("user_id")
      .select(col("user_id"), col("account_type"),
              col("updated_ts").cast("long"))
      .as[(Long, String, Long)].collect()
    assert(finalState === Array((1L, "Bronze", 1L), (2L, "Gold", 2L),
                                (3L, "Gold", 1L)))
  }

  test("evolved loop: two schema generations + a poisoned message through " +
       "registry decode, dead-letter, and bucketed upsert") {
    implicit val sqlCtx = spark.sqlContext
    val state = Files.createTempDirectory("graft-pipe2").toString + "/users"
    val ckpt = Files.createTempDirectory("graft-pipe2-ckpt").toString
    val quarantine = Files.createTempDirectory("graft-pipe2q").toString + "/q"

    // generation 2 adds a nullable tier
    val gen2Json = avroSchemaJson.replace(
      """{"name":"updated_at","type":"long"}]}""",
      """{"name":"updated_at","type":"long"},
        |{"name":"tier","type":["null","string"],"default":null}]}"""
        .stripMargin)
    val gen2Schema = new Schema.Parser().parse(gen2Json)
    def frame2(id: Long, name: String, acct: String, micros: Long,
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
      Array[Byte](0, 0, 0, 0, 8) ++ out.toByteArray
    }
    val registry = Sources.StaticSchemaRegistry(
      Map(7 -> avroSchemaJson, 8 -> gen2Json))
    val targetSchema = decodedSchema.add(StructField("tier", StringType))

    val stream = MemoryStream[Array[Byte]]
    val decoded = Sources.decodeConfluentSafe(
      stream.toDF().toDF("value"), col("value"), registry, gen2Json,
      targetSchema)
    val q = decoded.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // dead letters → quarantine; clean rows → bucketed upsert state
        batch.filter(col("__error").isNotNull)
          .write.mode("append").parquet(quarantine)
        val clean = batch.filter(col("__error").isNull).drop("__error")
          .withColumn("__bucket",
            pmod(xxhash64(col("user_id")), lit(4)).cast("int"))
        Cdc.latest(clean, Seq("user_id"), Seq(col("updated_at")))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("__bucket").parquet(state)
        ()
      }.start()
    stream.addData(Seq(
      frame(1, "user1", "Bronze", 1000000L),             // gen 1
      frame2(2, "user2", "Gold", 2000000L, "vip"),       // gen 2
      Array[Byte](9, 9, 9),                              // poison
      frame(2, "user2", "Silver", 1000000L)))            // stale version
    q.processAllAvailable()
    q.stop()
    val users = spark.read.parquet(state)
      .select("user_id", "account_type", "tier")
      .as[(Long, String, String)].collect().sortBy(_._1)
    // gen-1 row decoded with a null default; latest version won; the
    // poisoned frame went to quarantine, not into the state
    assert(users === Array((1L, "Bronze", null), (2L, "Gold", "vip")))
    val dead = spark.read.parquet(quarantine)
    assert(dead.count() === 1 &&
           dead.select("__error").as[String].head().contains("magic"))
  }

  test("reference topology continuity: snapshot.mode=initial (JDBC " +
       "snapshot with cursor on Derby) seeds the final, the change " +
       "stream resumes past the cursor, and the latest state equals " +
       "the one-shot union replay") {
    implicit val sqlCtx = spark.sqlContext
    // Derby stands in for the reference's Postgres (README.md:137
    // "snapshot.mode": "initial" — Debezium reads the full table once,
    // then streams the WAL from the snapshot's position)
    val url = "jdbc:derby:memory:graftboot;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute(
      """CREATE TABLE users (
        |  user_id BIGINT PRIMARY KEY,
        |  username VARCHAR(50),
        |  account_type VARCHAR(20),
        |  updated_at BIGINT)""".stripMargin)
    Seq((1L, "user1", "Bronze"), (2L, "user2", "Silver"),
        (3L, "user3", "Gold")).foreach { case (id, n, a) =>
      st.execute(s"INSERT INTO users VALUES ($id, '$n', '$a', 1000000)")
    }
    st.close(); conn.close()

    val state = Files.createTempDirectory("graft-boot").toString + "/users"
    val ckpt = Files.createTempDirectory("graft-boot-ckpt").toString

    // 1. the initial snapshot + its cursor, one consistent read
    val (snapRaw, hi) =
      Sources.snapshotWithCursor(spark, url, "users", "updated_at")
    assert(hi === Some(1000000L))
    // Derby uppercases unquoted identifiers; normalize to the wire names
    val snap = snapRaw.toDF(snapRaw.columns.map(
      _.toLowerCase(java.util.Locale.ROOT)).toIndexedSeq: _*)
    // seed the final through the SAME transform + merge the stream leg
    // uses — snapshot rows and change rows are one shape downstream
    Streaming.upsertBatch(
      Streaming.mvTransform(snap, Seq.empty)
        .withColumn("updated_ts",
                    Functions.microsToTimestampSecond(col("updated_at"))),
      // the SAME bucket count as the stream leg below — the bucket
      // layout is part of the store's contract, mixing counts would
      // strand seeded keys in buckets the merge never touches
      state, Seq("user_id"), Seq("updated_at"), numBuckets = 16)

    // 2. the change stream resumes from the cursor — re-delivering the
    // boundary row (at-least-once), upgrading a snapshotted entity,
    // inserting a post-snapshot one
    val stream = MemoryStream[Array[Byte]]
    val decoded = Sources.decodeAvro(
      stream.toDF().toDF("value"),
      Sources.confluentPayload(col("value")), avroSchemaJson,
      decodedSchema)
    val transformed = Streaming.mvTransform(decoded, Seq.empty)
      .withColumn("updated_ts",
                  Functions.microsToTimestampSecond(col("updated_at")))
    val q = Streaming.upsertSink(transformed, state, ckpt,
                                 Seq("user_id"), Seq("updated_at")).start()
    stream.addData(Seq(
      frame(3, "user3", "Gold", 1000000L),     // boundary re-delivery
      frame(2, "user2", "Gold", 2000000L),     // post-snapshot upgrade
      frame(4, "user4", "Bronze", 2000000L)))  // post-snapshot insert
    q.processAllAvailable()
    q.stop()

    // 3. continuity: no row lost at the handoff, none duplicated
    val got = spark.read.parquet(state)
      .select(col("user_id"), col("account_type"),
              col("updated_ts").cast("long"))
      .as[(Long, String, Long)].collect().toSet
    assert(got === Set((1L, "Bronze", 1L), (2L, "Gold", 2L),
                       (3L, "Gold", 1L), (4L, "Bronze", 2L)))
  }

  test("multi-table fan-out: one stream carries two tables' envelopes " +
       "through one foreachBatch; each final matches its per-table " +
       "batch replay; replay is a no-op; unrouted topics quarantine " +
       "raw and replay once their route exists") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-fanout").toString
    val ckpt = Files.createTempDirectory("graft-fanout-ckpt").toString

    // the second table of the README:277-278 growth path ("add tables
    // via table.include.list; one Kafka table + one MV per table")
    val ordersJson =
      """{"type":"record","name":"orders","fields":[
        |{"name":"order_id","type":"long"},
        |{"name":"amount_cents","type":"long"},
        |{"name":"updated_at","type":"long"}]}""".stripMargin
    val ordersSchema = StructType(Seq(
      StructField("order_id", LongType),
      StructField("amount_cents", LongType),
      StructField("updated_at", LongType)))
    def orderFrame(id: Long, cents: Long, micros: Long): Array[Byte] = {
      val schema = new Schema.Parser().parse(ordersJson)
      val rec = new GenericData.Record(schema)
      rec.put("order_id", id)
      rec.put("amount_cents", cents)
      rec.put("updated_at", micros)
      val out = new ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(out, null)
      new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
      enc.flush()
      Array[Byte](0, 0, 0, 0, 9) ++ out.toByteArray
    }
    val registry = Sources.StaticSchemaRegistry(
      Map(7 -> avroSchemaJson, 9 -> ordersJson))
    val routes = Seq(
      // users runs the MV micros conversion in place (README:226-227)
      Streaming.TableRoute("shop.public.users", "users", avroSchemaJson,
        decodedSchema, Seq("user_id"), Seq("updated_at"),
        microsCols = Seq("updated_at")),
      Streaming.TableRoute("shop.public.orders", "orders", ordersJson,
        ordersSchema, Seq("order_id"), Seq("updated_at")))

    val userFrames = Seq(
      frame(1, "user1", "Bronze", 1000000L),
      frame(2, "user2", "Silver", 1000000L),
      frame(2, "user2", "Gold", 2000000L),
      frame(2, "user2", "Gold", 2000000L)) // at-least-once duplicate
    val orderFrames = Seq(
      orderFrame(10, 500, 1000000L),
      orderFrame(10, 700, 2000000L),
      orderFrame(11, 900, 2000000L))

    val quarantine = Files.createTempDirectory("graft-fanout-q").toString
    val stream = MemoryStream[(String, Array[Byte])]
    val q = Streaming.multiTableSink(
      stream.toDF().toDF("topic", "value"), registry, routes, base,
      ckpt, numBuckets = 4, quarantineDir = Some(quarantine)).start()
    // batch 1: both tables interleaved
    stream.addData(
      userFrames.take(2).map(("shop.public.users", _)) ++
      orderFrames.take(1).map(("shop.public.orders", _)))
    q.processAllAvailable()
    // batch 2: updates + duplicate + a topic nobody routes + a
    // poisoned frame on users (must dead-letter, not stall orders)
    stream.addData(
      userFrames.drop(2).map(("shop.public.users", _)) ++
      orderFrames.drop(1).map(("shop.public.orders", _)) :+
      (("shop.public.ghost", frame(9, "ghost", "X", 1L))) :+
      (("shop.public.users", Array[Byte](9, 9, 9))))
    q.processAllAvailable()
    q.stop()

    // the poisoned frame went to the users quarantine, nowhere else
    val dead = spark.read.parquet(s"$quarantine/users")
    assert(dead.count() === 1 &&
           dead.select("__error").as[String].head().contains("magic"))
    // orders never produced dead letters → no parquet-less dir created
    assert(!new java.io.File(s"$quarantine/orders").exists())

    // per-table one-shot batch replays over ALL frames = the oracle
    val usersExp = Cdc.latest(
        Streaming.mvTransform(
          Sources.decodeConfluent(userFrames.toDF("value"), col("value"),
            registry, avroSchemaJson, decodedSchema), Seq.empty)
          .withColumn("updated_at",
            Functions.microsToTimestampSecond(col("updated_at"))),
        Seq("user_id"), Seq(col("updated_at")))
      .select(col("user_id"), col("account_type"),
              col("updated_at").cast("long"))
      .as[(Long, String, Long)].collect().toSet
    def usersGot() = spark.read.parquet(s"$base/users")
      .select(col("user_id"), col("account_type"),
              col("updated_at").cast("long"))
      .as[(Long, String, Long)].collect().toSet
    assert(usersGot() === usersExp && usersExp.size === 2)

    val ordersExp = Cdc.latest(
        Sources.decodeConfluent(orderFrames.toDF("value"), col("value"),
          registry, ordersJson, ordersSchema),
        Seq("order_id"), Seq(col("updated_at")))
      .select("order_id", "amount_cents")
      .as[(Long, Long)].collect().toSet
    def ordersGot() = spark.read.parquet(s"$base/orders")
      .select("order_id", "amount_cents")
      .as[(Long, Long)].collect().toSet
    assert(ordersGot() === ordersExp &&
           ordersExp === Set((10L, 700L), (11L, 900L)))

    // the unrouted topic landed in NO final, but was NOT silently
    // lost: the route-miss leg kept its raw frame replayable
    assert(!new java.io.File(s"$base/ghost").exists())
    val unrouted = spark.read.parquet(s"$quarantine/__unrouted")
    assert(unrouted.count() === 1 &&
           unrouted.select("topic").as[String].head() ===
             "shop.public.ghost")

    // crash-window re-delivery of batch 2: every merge is idempotent,
    // so the replayed batch leaves both finals unchanged; the
    // quarantine leg is documented at-least-once, so its dead letter
    // duplicates (diagnostic evidence, not state)
    Streaming.multiTableBatch(
      (userFrames.drop(2).map(("shop.public.users", _)) ++
       orderFrames.drop(1).map(("shop.public.orders", _)) :+
       (("shop.public.users", Array[Byte](9, 9, 9))))
        .toDF("topic", "value"),
      registry, routes, base, 4, Some(quarantine))
    assert(usersGot() === usersExp && ordersGot() === ordersExp)
    assert(spark.read.parquet(s"$quarantine/users").count() === 2)

    // the README:277-278 growth path closes the loop: the user adds the
    // missing route, then replays the quarantined frames straight
    // through the router (N = 3 routes — the concurrent-leg path) —
    // zero silent loss end to end, and the two existing finals are
    // untouched by the replay
    val ghostRoute = Streaming.TableRoute("shop.public.ghost", "ghost",
      avroSchemaJson, decodedSchema, Seq("user_id"), Seq("updated_at"))
    Streaming.multiTableBatch(unrouted.select("topic", "value"), registry,
      routes :+ ghostRoute, base, 4, Some(quarantine))
    assert(spark.read.parquet(s"$base/ghost")
      .select("user_id").as[Long].collect().toSeq === Seq(9L))
    assert(usersGot() === usersExp && ordersGot() === ordersExp)
  }

  test("route-miss quarantine catches NULL-topic frames: === and !isin " +
       "are both null-false, so without the explicit isNull leg the " +
       "frame would vanish from every leg AND the quarantine") {
    val registry = Sources.StaticSchemaRegistry(Map(7 -> avroSchemaJson))
    val base = Files.createTempDirectory("graft-nulltopic").toString
    val quarantine = Files.createTempDirectory("graft-nulltopic-q").toString
    val rt = Streaming.TableRoute("t.a", "t_a", avroSchemaJson,
      decodedSchema, Seq("user_id"), Seq("updated_at"))
    val batch = Seq(
        (Option.empty[String], frame(1, "u1", "Gold", 1000000L)),
        (Some("t.a"), frame(2, "u2", "Gold", 2000000L)))
      .toDF("topic", "value")
    Streaming.multiTableBatch(batch, registry, Seq(rt), base, 4,
                              Some(quarantine))
    // the routed frame landed; the null-topic frame quarantined raw
    assert(spark.read.parquet(s"$base/t_a")
      .select("user_id").as[Long].collect().toSeq === Seq(2L))
    val unrouted = spark.read.parquet(s"$quarantine/__unrouted")
    assert(unrouted.count() === 1 &&
           unrouted.select("topic").as[Option[String]].head().isEmpty)
  }

  test("router legs: one concurrent 3-route batch produces finals " +
       "identical to three serial single-route batches, and the " +
       "latency delta is reported") {
    val registry = Sources.StaticSchemaRegistry(Map(7 -> avroSchemaJson))
    // three independent tables sharing the users schema — what matters
    // here is N independent legs, not the payload shape
    val topics = Seq("t.a", "t.b", "t.c")
    def route(t: String) = Streaming.TableRoute(
      t, t.replace('.', '_'), avroSchemaJson, decodedSchema,
      Seq("user_id"), Seq("updated_at"))
    val frames = for {
      t <- topics; i <- 1 to 50
    } yield (t, frame(i.toLong, s"u$i", "Gold", 1000000L + i))
    val batch = frames.toDF("topic", "value").localCheckpoint()
    val serialBase = Files.createTempDirectory("graft-rl-s").toString
    val parallelBase = Files.createTempDirectory("graft-rl-p").toString
    // serial path BY CONSTRUCTION: one route per call takes the
    // routes.size <= 1 branch
    val t0 = System.nanoTime()
    topics.foreach { t =>
      Streaming.multiTableBatch(batch, registry, Seq(route(t)),
                                serialBase, 4)
    }
    val serialMs = (System.nanoTime() - t0) / 1e6
    val t1 = System.nanoTime()
    Streaming.multiTableBatch(batch, registry, topics.map(route),
                              parallelBase, 4)
    val parallelMs = (System.nanoTime() - t1) / 1e6
    for (t <- topics) {
      val tbl = t.replace('.', '_')
      def rows(b: String) = spark.read.parquet(s"$b/$tbl")
        .select(col("user_id"), col("account_type"),
                col("updated_at").cast("long"))
        .as[(Long, String, Long)].collect().toSet
      val s = rows(serialBase)
      assert(s === rows(parallelBase) && s.size === 50, t)
    }
    info(f"3-route micro-batch: serial ${serialMs}%.0f ms, " +
         f"concurrent ${parallelMs}%.0f ms " +
         f"(${serialMs / parallelMs}%.2fx)")
  }

  test("REST-edge topology: Confluent-framed changes produced through the " +
       "Kafka REST Proxy protocol (S9), drained in cursor micro-batches, " +
       "decoded (S4) and merged (U1) — duplicate delivery collapsed, no " +
       "row lost at the batch seam") {
    val srv = new RestProxy.InMemoryServer(numPartitions = 2)
    val url = srv.start()
    try {
      val state = Files.createTempDirectory("graft-rest").toString + "/users"
      def produce(frames: Seq[(Long, Array[Byte])]): Unit =
        Sources.restProduce(
          frames.toDF("uid", "value"), url, "shop.public.users",
          col("uid").cast("string"), col("value"), pmod(col("uid"), lit(2)))
      // one REST micro-batch: bounded consume from the cursor → the SAME
      // decode + MV transform + bucketed merge the Kafka leg uses
      def drainInto(cursor: Map[Int, Long]): Map[Int, Long] = {
        val (batch, next) = Sources.restConsumeWithCursor(
          spark, url, "shop.public.users", cursor)
        val decoded = Sources.decodeAvro(
          batch, Sources.confluentPayload(col("value")), avroSchemaJson,
          decodedSchema)
        Streaming.upsertBatch(
          Streaming.mvTransform(decoded, Seq.empty)
            .withColumn("updated_ts",
                        Functions.microsToTimestampSecond(col("updated_at"))),
          state, Seq("user_id"), Seq("updated_at"), numBuckets = 16)
        next
      }
      produce(Seq(
        1L -> frame(1, "user1", "Bronze", 1000000L),
        2L -> frame(2, "user2", "Silver", 1000000L),
        3L -> frame(3, "user3", "Gold", 1000000L)))
      val c1 = drainInto(Map.empty)
      produce(Seq(
        3L -> frame(3, "user3", "Gold", 1000000L),   // duplicate delivery
        2L -> frame(2, "user2", "Gold", 2000000L),   // post-batch upgrade
        4L -> frame(4, "user4", "Bronze", 2000000L)))// post-batch insert
      val c2 = drainInto(c1)
      assert(c2.values.sum === 6L)
      val got = spark.read.parquet(state)
        .select(col("user_id"), col("account_type"),
                col("updated_ts").cast("long"))
        .as[(Long, String, Long)].collect().toSet
      assert(got === Set((1L, "Bronze", 1L), (2L, "Gold", 2L),
                         (3L, "Gold", 1L), (4L, "Bronze", 2L)))
    } finally srv.stop()
  }

  test("multi-topic REST routing under crash: N graft-rest topics drain " +
       "through concurrent router legs into N upsert stores; duplicates " +
       "collapse; one leg's crash corrupts no sibling; replay converges") {
    // the reference's FAQ growth path (README.md:277-278): one topic per
    // table + one MV each — here N bounded REST consumes union into the
    // shared router batch, and the N legs run concurrently into
    // disjoint upsert stores on a fault-injectable filesystem
    spark.sparkContext.hadoopConfiguration
      .set("fs.fault.impl", "graft.FaultFs")
    val srv = new RestProxy.InMemoryServer(numPartitions = 2)
    val url = srv.start()
    try {
      val tables = Seq("users", "orders", "items")
      val topics = tables.map(t => s"shop.public.$t")
      val registry = Sources.StaticSchemaRegistry(Map(7 -> avroSchemaJson))
      val root = "fault:///tmp/graft-mtroute"
      val base = s"$root/state"
      val ffs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      ffs.delete(new org.apache.hadoop.fs.Path(root), true)
      val routes = tables.map(t => Streaming.TableRoute(
        s"shop.public.$t", t, avroSchemaJson, decodedSchema,
        Seq("user_id"), Seq("updated_at")))

      def produce(topic: String, frames: Seq[(Long, Array[Byte])]): Unit =
        Sources.restProduce(frames.toDF("uid", "value"), url, topic,
                            col("uid").cast("string"), col("value"),
                            pmod(col("uid"), lit(2)))

      var cursors: Map[String, Map[Int, Long]] =
        topics.map(_ -> Map.empty[Int, Long]).toMap
      def drain(): Unit = {
        val consumed = topics.map { t =>
          val (df, next) =
            Sources.restConsumeWithCursor(spark, url, t, cursors(t))
          (t, df, next)
        }
        val batch = consumed.map(_._2).reduce(_ unionByName _)
        Streaming.multiTableBatch(batch, registry, routes, base,
                                  numBuckets = 4)
        // cursors advance only after every leg lands: a crashed batch
        // replays all topics from the same offsets (at-least-once, the
        // legs' idempotent merges absorb it)
        cursors = cursors ++ consumed.map { case (t, _, n) => t -> n }
      }

      def store(t: String): Set[(Long, String, Long)] =
        Streaming.readUpsertState(spark, s"$base/$t")
          .select(col("user_id"), col("account_type"),
                  col("updated_at"))
          .as[(Long, String, Long)].collect().toSet

      tables.foreach { t =>
        produce(s"shop.public.$t", Seq(
          1L -> frame(1, s"$t-a", "Bronze", 1000000L),
          2L -> frame(2, s"$t-b", "Silver", 1000000L)))
      }
      drain()
      tables.foreach { t =>
        produce(s"shop.public.$t", Seq(
          2L -> frame(2, s"$t-b", "Silver", 1000000L), // dup delivery
          2L -> frame(2, s"$t-b", "Gold", 2000000L),   // upgrade
          3L -> frame(3, s"$t-c", "Bronze", 2000000L)))
      }
      drain()
      val wave2 = tables.map(t => t -> store(t)).toMap
      tables.foreach { t =>
        assert(wave2(t) === Set((1L, "Bronze", 1000000L),
                                (2L, "Gold", 2000000L),
                                (3L, "Bronze", 2000000L)), t)
      }

      // wave 3 with a crash armed on the ORDERS leg's first mutating
      // store operation — the sibling legs' stores must stay readable
      // and uncorrupted, and the replayed batch must converge all three
      tables.foreach { t =>
        produce(s"shop.public.$t",
                Seq(4L -> frame(4, s"$t-d", "Gold", 3000000L)))
      }
      FaultFs.arm("/graft-mtroute/state/orders/", 1, "before")
      val e = intercept[Throwable] { drain() }
      FaultFs.disarm()
      assert(FaultFs.caused(e), s"expected the injected crash, got $e")
      val expect3 = (t: String) => wave2(t) + ((4L, "Gold", 3000000L))
      tables.filterNot(_ == "orders").foreach { t =>
        val got = store(t)
        assert(got === wave2(t) || got === expect3(t),
               s"sibling $t corrupted by the orders-leg crash: $got")
      }
      drain() // cursors never advanced — full replay
      tables.foreach(t => assert(store(t) === expect3(t), t))
    } finally srv.stop()
  }
}
