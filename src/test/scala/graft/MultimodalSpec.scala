package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = {
    val rows = Seq(
      Row(1L, "image", "fakejpegbytes".getBytes, Row(640, 480, null, "image/jpeg")),
      Row(2L, "audio", "fakewavbytes".getBytes, Row(null, null, 1200L, "audio/wav")),
      Row(3L, "image", null, Row(10, 10, null, "image/png")))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2),
                          Multimodal.mediaSchema)
  }

  test("extractFeatures appends a fixed-dim float vector per row") {
    val out = Multimodal.extractFeatures(media, 8)
    assert(out.schema.fieldNames.last === "features")
    val feats = out.orderBy("media_id").select("features")
      .as[Seq[Float]].collect()
    assert(feats.forall(_.length === 8))
    assert(feats(2).forall(_ === 0f)) // null payload → zero vector
    // determinism: same payload → same features
    val again = Multimodal.extractFeatures(media, 8)
      .orderBy("media_id").select("features").as[Seq[Float]].collect()
    assert(feats === again)
  }

  test("metadataOnly never references the payload column (column pruning)") {
    val out = Multimodal.metadataOnly(media)
    assert(!out.columns.contains("payload"))
    assert(out.filter(col("mime") === "image/jpeg").count() === 1)
  }

  test("samplePayload emits n deterministic samples per non-null payload") {
    val out = Multimodal.samplePayload(media, 4)
    assert(out.count() === 8) // 2 non-null payloads × 4 samples
    assert(out.groupBy("media_id").count()
      .select("count").as[Long].collect().forall(_ === 4L))
  }

  test("resizeStub bounds the payload and rewrites the meta dims") {
    val out = Multimodal.resizeStub(media, 4, 2)
    val rows = out.select(col("media_id"),
        when(col("payload").isNotNull, length(col("payload")))
          .otherwise(lit(-1)).as("len"),
        col("meta.width"), col("meta.height"))
      .orderBy("media_id")
      .as[(Long, Int, Int, Int)].collect()
    rows.foreach { case (_, len, w, h) =>
      assert(len === -1 || len <= 8) // truncated to w*h, nulls untouched
      assert(w === 4 && h === 2)
    }
    assert(rows.exists(_._2 === -1)) // the null payload stays null
  }
}
