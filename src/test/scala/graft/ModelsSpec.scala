package graft

class ModelsSpec extends SparkSpec {
  import spark.implicits._

  test("typed Datasets load with compile-time schemas") {
    val ev = Models.events(spark, sf("events"))
    val purchases = ev.filter(_.event_type == "purchase")
      .map(e => (e.user_id, e.value))
    assert(purchases.count() > 0)

    val docs = Models.documents(spark, sf("documents"))
    assert(docs.head().text.nonEmpty)

    val emb = Models.embeddings(spark, sf("embeddings"))
    assert(emb.head().embedding.length === 64)
  }

  test("typed latest-state over the CDC shape") {
    val changes = Seq(
      Models.UserChange(1L, Some("user1"), Some("Bronze"), 1000000L, 0L),
      Models.UserChange(1L, Some("user1"), Some("Gold"), 2000000L, 1L)).toDS()
    val latest = Cdc.latest(changes.toDF(), Seq("user_id"),
      Seq(org.apache.spark.sql.functions.col("updated_at"),
          org.apache.spark.sql.functions.col("kafka_offset")))
      .as[Models.UserChange]
    assert(latest.head().account_type === Some("Gold"))
  }
}
