package graft

import org.apache.spark.sql.functions._

class UdafsSpec extends SparkSpec {
  import spark.implicits._

  test("TopKByScore keeps k best with deterministic tie-break") {
    val topk = udaf(new Udafs.TopKByScore(3))
    val df = Seq(("g1", 1L, 5.0), ("g1", 2L, 9.0), ("g1", 3L, 5.0),
                 ("g1", 4L, 7.0), ("g2", 5L, 1.0))
      .toDF("g", "id", "score")
    val out = df.groupBy("g")
      .agg(topk(col("id"), col("score")).as("top"))
      .orderBy("g")
      .select(col("g"), col("top"))
      .as[(String, Seq[(Long, Double)])].collect()
    assert(out(0)._2 === Seq((2L, 9.0), (4L, 7.0), (1L, 5.0))) // id 1 < id 3
    assert(out(1)._2 === Seq((5L, 1.0)))
  }

  test("TopKByScore equals orderBy+limit on the embeddings table") {
    val e = Tables(spark, sf("embeddings"), "embeddings")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val scored = e.crossJoin(broadcast(q))
      .select(col("vec_id"),
              Functions.cosine(col("embedding"), col("q_emb")).as("sim"))
    val viaSort = scored.orderBy(col("sim").desc, col("vec_id"))
      .limit(5).select("vec_id").as[Long].collect()
    val topk = udaf(new Udafs.TopKByScore(5))
    val viaAgg = scored.agg(topk(col("vec_id"), col("sim")).as("top"))
      .select(explode(col("top")).as("t")).select("t._1")
      .as[Long].collect()
    assert(viaAgg === viaSort)
  }

  test("VectorCentroid averages dim-wise") {
    val cent = udaf(new Udafs.VectorCentroid(2))
    val df = Seq(("a", Seq(1f, 2f)), ("a", Seq(3f, 4f)), ("b", Seq(5f, 6f)))
      .toDF("g", "v")
    val out = df.groupBy("g").agg(cent(col("v")).as("c"))
      .orderBy("g").as[(String, Seq[Double])].collect()
    assert(out(0)._2 === Seq(2.0, 3.0))
    assert(out(1)._2 === Seq(5.0, 6.0))
  }
}
