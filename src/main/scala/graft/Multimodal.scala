package graft

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2.10 L7): image/audio/video as
  * opaque `binary` payloads with a typed metadata struct, processed by
  * per-partition batch transforms.
  *
  * The Spark-side plumbing — schema, partitioning, per-partition transform
  * signature, batch shape — is real and tested; the codec step itself is a
  * deterministic STUB (this container has no image/audio libraries). Swap
  * [[stubDecode]] for a real decoder (e.g. JNI/FFI image lib) without
  * touching anything else: the contract is bytes → fixed-length feature
  * vector.
  */
object Multimodal {

  /** Canonical multimodal schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("mime", StringType, nullable = true))), nullable = true)))

  /** STUB codec: deterministic fake "feature extraction" — dim floats
    * derived from payload bytes. Replace with a real decoder; the
    * signature (one payload in, one fixed-dim vector out) is the contract
    * a Pandas-UDF/mapInPandas equivalent would also honor.
    */
  def stubDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    if (payload == null) Array.fill(dim)(0f)
    else {
      val out = new Array[Float](dim)
      var h = 1125899906842597L // deterministic rolling hash of the bytes
      var i = 0
      while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
      var k = 0
      while (k < dim) {
        h = h * 6364136223846793005L + 1442695040888963407L
        out(k) = ((h >>> 40).toInt % 1000) / 1000.0f
        k += 1
      }
      out
    }
  }

  /** Partition-parallel feature extraction: binary payload → `features`
    * (ArrayType(FloatType)). One codec instance per partition, rows
    * streamed through it in batch — the same execution shape as
    * `mapInPandas` with an Arrow batch, minus Python.
    */
  def extractFeatures(df: DataFrame, dim: Int): DataFrame = {
    val outSchema = df.schema.add("features", ArrayType(FloatType))
    val inArity = df.schema.length
    df.mapPartitions { rows =>
      // per-partition setup happens here (codec init in a real decoder)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        Row.fromSeq(r.toSeq :+ (stubDecode(payload, dim).toSeq))
      }
    }(RowEncoder.encoderFor(outSchema)).toDF()
      .select((0 until inArity).map(i => col(outSchema.fields(i).name)) :+
        col("features"): _*)
  }

  /** Metadata-pruned scan: filters on the typed meta struct never touch the
    * (heavy) payload column — at 100 TB the parquet reader prunes the
    * binary column entirely for metadata-only queries.
    */
  def metadataOnly(df: DataFrame): DataFrame =
    df.select(col("media_id"), col("kind"), col("meta.*"))

  /** Resize stand-in: payload → payload transform that also rewrites the
    * typed meta dims — the thumbnail/downsample shape. The stub truncates
    * the byte stream to the target "pixel" budget; a real codec swaps in
    * the same (payload, w, h) → payload contract.
    */
  def resizeStub(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("payload",
        when(col("payload").isNotNull,
             substring(col("payload"), 1, w * h)).otherwise(col("payload")))
      .withColumn("meta",
        struct(lit(w).as("width"), lit(h).as("height"),
               col("meta.duration_ms").as("duration_ms"),
               col("meta.mime").as("mime")))

  /** Frame-sample stand-in: deterministic sample of `n` byte offsets per
    * payload (what frame sampling does to video, shape-wise): returns
    * (media_id, sample_idx, byte).
    */
  def samplePayload(df: DataFrame, n: Int): DataFrame =
    df.filter(col("payload").isNotNull)
      .select(col("media_id"),
              posexplode(transform(sequence(lit(0), lit(n - 1)),
                i => conv(hex(col("payload").substr(
                       pmod(i * lit(2654435761L), length(col("payload")))
                         .cast("int") + 1, lit(1))), 16, 10).cast("int")))
                .as(Seq("sample_idx", "byte")))
}
