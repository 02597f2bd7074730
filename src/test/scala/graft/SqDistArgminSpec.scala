package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Pins the r16 k-means assignment rewrite: the native [[SqDistArgmin]]
  * loop must reproduce the r15 relational formulation (explode → join
  * centroids on i → per-(vec, cid) sum with null products skipped →
  * min(struct(d, cid))) on every edge the relational form could see —
  * null coordinate elements, arrays shorter/longer than a centroid's
  * dimension set, sparse centroid grids, and exact (d, cid) ties.
  */
class SqDistArgminSpec extends SparkSpec {
  import spark.implicits._

  private def argminCol(cids: Array[Long], dims: Array[Array[Int]],
                        cvals: Array[Array[Long]]) =
    ColumnBridge.column(
      SqDistArgmin(ColumnBridge.expression(col("xs")), cids, dims, cvals))

  /** The r15 relational semantics, replayed in Scala: term iff both
    * sides have dimension i and the coordinate is non-null.
    */
  private def reference(xs: Array[Option[Long]], cids: Array[Long],
                        dims: Array[Array[Int]],
                        cvals: Array[Array[Long]]): (Long, Long) =
    cids.indices.map { k =>
      val d = dims(k).indices.map { t =>
        val i = dims(k)(t)
        if (i < xs.length && xs(i).isDefined) {
          val diff = xs(i).get - cvals(k)(t); diff * diff
        } else 0L
      }.sum
      (d, cids(k))
    }.min

  test("SqDistArgmin matches the relational join+sum reference on " +
       "random grids with nulls, short arrays and sparse centroids") {
    val rnd = new scala.util.Random(42)
    val k = 8
    val cids = (0 until k).map(_.toLong).toArray
    // sparse grids: each centroid gets a random subset of dims 0..15
    val dims = Array.fill(k)(
      (0 until 16).filter(_ => rnd.nextInt(10) > 1).toArray)
    val cvals = dims.map(_.map(_ => rnd.nextInt(40001) - 20000L))
    val rows = (1 to 500).map { _ =>
      Array.fill(rnd.nextInt(20)) {
        if (rnd.nextInt(12) == 0) None
        else Some(rnd.nextInt(40001) - 20000L)
      }
    }
    val got = rows.map(_.toSeq).toDF("xs")
      .select(argminCol(cids, dims, cvals).as("best"))
      .select(col("best.d"), col("best.cid"))
      .as[(Long, Long)].collect()
    val want = rows.map(r => reference(r, cids, dims, cvals))
    assert(got.toSeq === want.toSeq)
  }

  test("SqDistArgmin breaks exact distance ties to the lower cid " +
       "(the min(struct(d, cid)) contract)") {
    // two identical centroids => identical d; cid 1 must win over 3
    val cids = Array(1L, 3L)
    val dims = Array(Array(0, 1), Array(0, 1))
    val cvals = Array(Array(5L, -7L), Array(5L, -7L))
    val got = Seq(Array(0L, 0L)).toDF("xs")
      .select(argminCol(cids, dims, cvals).as("best"))
      .select(col("best.d"), col("best.cid")).as[(Long, Long)].head()
    assert(got === ((74L, 1L)))
  }

  test("kmeansFit still hash-matches the r15 relational round on the " +
       "fixture corpus (assignment + centroid recurrence end-to-end)") {
    // end-to-end guard: the full fit over sf0.001 embeddings must give
    // the exact per-cluster signature the DuckDB oracle replays (the
    // q_cluster_kmeans shape) - any drift in distance, tie-break, or
    // the floored rational re-centering moves `ssd`/`n`/`min_vec`
    val e = Tables(spark, sf("embeddings"), "embeddings")
      .limit(300).localCheckpoint()
    val out = LlmOps.kmeansInteger(e, 4, 2)
      .groupBy("cluster")
      .agg(count(lit(1)).as("n"), sum("d").as("ssd"),
           min("vec_id").as("min_vec"))
      .orderBy("cluster")
    // reference = the r15 relational formulation, inlined
    val x = e.filter(col("embedding").isNotNull)
      .select(col("vec_id"),
              posexplode(col("embedding")).as(Seq("p", "xv")))
      .select(col("vec_id"), (col("p") + 1).cast("long").as("i"),
              expr("CAST(floor(CAST(xv AS DOUBLE) * 10000.0) AS BIGINT)")
                .as("x"))
    var cents = x.join(broadcast(LlmOps.forgySeeds(e, 4)), "vec_id")
      .select(col("cid"), col("i"), col("x").as("c"))
      .localCheckpoint()
    def assign(c: org.apache.spark.sql.DataFrame) =
      LlmOps.assignToCentroids(x, c)
    for (_ <- 1 to 2) {
      val sums = assign(cents).join(x, "vec_id")
        .groupBy(col("cluster").as("cid"), col("i"))
        .agg(sum("x").as("s"), count(lit(1)).as("n"))
      cents = cents.select(col("cid"), col("i"), col("c").as("c_old"))
        .join(sums, Seq("cid", "i"), "left")
        .select(col("cid"), col("i"), expr(
          "CASE WHEN n IS NULL THEN c_old " +
          "WHEN s < 0 THEN -((-s) div n) ELSE s div n END").as("c"))
        .localCheckpoint()
    }
    val ref = assign(cents)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"), sum("d").as("ssd"),
           min("vec_id").as("min_vec"))
      .orderBy("cluster")
    assert(out.collect().toSeq === ref.collect().toSeq)
  }

  test("scatterPartials (r16 in-row triangle) equals the r15 self-join " +
       "formulation entry-for-entry, nulls included") {
    // fixture embeddings plus a planted row with null elements and a
    // short array - the cases where the two formulations could diverge
    val e = Tables(spark, sf("embeddings"), "embeddings")
      .limit(120)
      .select(col("vec_id"), col("embedding"))
      .unionByName(Seq(
        (900001L, Seq[Option[Double]](Some(0.5), None, Some(-0.25))),
        (900002L, Seq[Option[Double]](Some(1.0)))
      ).toDF("vec_id", "embedding")
        .select(col("vec_id"),
                col("embedding").cast("array<float>").as("embedding")))
      .localCheckpoint()
    val got = LlmOps.scatterPartials(e)
      .orderBy("kind", "i", "j").collect().toSeq
    // r15 formulation, inlined
    val x = e
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("p", "xv")))
      .select(col("vec_id"), (col("p") + 1).cast("long").as("i"),
              expr("CAST(floor(CAST(xv AS DOUBLE) * 10000.0) AS BIGINT)")
                .as("x"))
      .localCheckpoint()
    val n = e.agg(count(lit(1)).cast("long").as("v"))
      .select(lit("n").as("kind"), lit(0L).as("i"), lit(0L).as("j"),
              col("v"))
    val s = x.groupBy("i").agg(sum("x").as("v"))
      .select(lit("s").as("kind"), col("i"), lit(0L).as("j"), col("v"))
    val p = x
      .join(x.select(col("vec_id"), col("i").as("j"), col("x").as("y")),
            "vec_id")
      .groupBy("i", "j")
      .agg(expr("CAST(sum(CAST(x * y AS DECIMAL(38,0))) AS BIGINT)")
             .as("v"))
      .select(lit("p").as("kind"), col("i"), col("j"), col("v"))
    val want = n.unionByName(s).unionByName(p)
      .orderBy("kind", "i", "j").collect().toSeq
    assert(got === want)
  }
}
