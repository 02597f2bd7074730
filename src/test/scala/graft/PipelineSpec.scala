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
}
