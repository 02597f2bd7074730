package graft

import org.apache.spark.sql.functions._

class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("qualifying aggregates route to the pre-aggregated projection " +
       "with identical results; disqualified shapes stay on the base") {
    GraftExtensions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-proj").toString
    val basePath = s"$dir/events_base"
    val projPath = s"$dir/events_by_type"
    Tables(spark, sf("events"), "events")
      .select("event_id", "user_id", "event_type")
      .write.parquet(basePath)
    ProjectionRouter.writeProjection(
      spark.read.parquet(basePath), Seq("event_type"), Seq("user_id"),
      projPath)
    // ground truth BEFORE registration (no routing possible)
    def query() = spark.read.parquet(basePath)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
           sum("user_id").as("s"),
           min("user_id").as("mn"),
           max("user_id").as("mx"),
           // avg must divide by the NON-NULL count partial, not cnt
           avg("user_id").as("av"))
      .orderBy("event_type")
    val expected = query()
      .as[(String, Long, Long, Long, Long, Double)].collect()
    try {
      ProjectionRouter.register(ProjectionRouter.Projection(
        basePath, projPath, Set("event_type"), Set("user_id")))
      val routed = query()
      // the optimized plan reads the PROJECTION files, not the base
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains("events_by_type"), plan.take(3000))
      assert(!plan.contains("events_base"), plan.take(3000))
      // and re-aggregating the partials is answer-identical
      assert(routed.as[(String, Long, Long, Long, Long, Double)].collect()
               === expected)
      // a DISTINCT aggregate cannot be answered from partials → no route
      val distinctQ = spark.read.parquet(basePath)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("d"))
      val dPlan = distinctQ.queryExecution.executedPlan.toString
      assert(dPlan.contains("events_base"), dPlan.take(3000))
      // an unregistered measure keeps the base too
      val otherQ = spark.read.parquet(basePath)
        .groupBy("event_type").agg(sum("event_id").as("s2"))
      assert(otherQ.queryExecution.executedPlan.toString
               .contains("events_base"))
      // a non-aggregate read of the base is untouched
      assert(spark.read.parquet(basePath).count() ===
             Tables(spark, sf("events"), "events").count())
    } finally ProjectionRouter.clear()
  }

  test("a projection-key filter routes (answer-preserving from " +
       "partials, hit counter advances); a measure filter does not") {
    GraftExtensions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-projf").toString
    val basePath = s"$dir/events_base"
    val projPath = s"$dir/events_by_type"
    Tables(spark, sf("events"), "events")
      .select("event_id", "user_id", "event_type")
      .write.parquet(basePath)
    ProjectionRouter.writeProjection(
      spark.read.parquet(basePath), Seq("event_type"), Seq("user_id"),
      projPath)
    def query() = spark.read.parquet(basePath)
      .filter(col("event_type") =!= "view")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("user_id").as("s"))
      .orderBy("event_type")
    val expected = query().as[(String, Long, Long)].collect()
    try {
      ProjectionRouter.register(ProjectionRouter.Projection(
        basePath, projPath, Set("event_type"), Set("user_id")))
      val before = ProjectionRouter.hitCount
      val routed = query()
      val plan = routed.queryExecution.executedPlan.toString
      // the rewrite REALLY fired: counter + the plan reads the partials
      assert(ProjectionRouter.hitCount > before)
      assert(plan.contains("events_by_type"), plan.take(3000))
      assert(!plan.contains("events_base"), plan.take(3000))
      assert(routed.as[(String, Long, Long)].collect() === expected)
      // a filter referencing a MEASURE selects raw rows inside a key
      // combination — unanswerable from partials, must stay on base
      val measureFiltered = spark.read.parquet(basePath)
        .filter(col("user_id") > 10)
        .groupBy("event_type").agg(count(lit(1)).as("n"))
      assert(measureFiltered.queryExecution.executedPlan.toString
               .contains("events_base"))
      // a non-deterministic filter must not route either (plan-only
      // check — never executed; note rand() < 2.0 would be folded to
      // true and legitimately pruned by Spark before our rule runs)
      val nonDet = spark.read.parquet(basePath)
        .filter(rand() < 0.5)
        .groupBy("event_type").agg(count(lit(1)).as("n"))
      assert(nonDet.queryExecution.executedPlan.toString
               .contains("events_base"))
    } finally ProjectionRouter.clear()
  }

  test("a DECIMAL measure routes: sum re-aggregates the stored decimal " +
       "partials and casts back to the original aggregate's type") {
    GraftExtensions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-projdec")
      .toString
    val basePath = s"$dir/lineitem_base"
    val projPath = s"$dir/li_by_flag"
    Tables(spark, sf("lineitem"), "lineitem")
      .select(col("l_returnflag"),
              col("l_extendedprice").cast("decimal(12,2)").as("price"))
      .write.parquet(basePath)
    ProjectionRouter.writeProjection(
      spark.read.parquet(basePath), Seq("l_returnflag"), Seq("price"),
      projPath)
    def query() = spark.read.parquet(basePath)
      .groupBy("l_returnflag")
      .agg(sum("price").as("s"), min("price").as("mn"),
           max("price").as("mx"))
      .orderBy("l_returnflag")
    val expected = query().collect()
    // sum(decimal(12,2)) = decimal(22,2) — the routed plan must keep it
    val expectedType = query().schema("s").dataType
    try {
      ProjectionRouter.register(ProjectionRouter.Projection(
        basePath, projPath, Set("l_returnflag"), Set("price")))
      val routed = query()
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains("li_by_flag"), plan.take(3000))
      assert(!plan.contains("lineitem_base"), plan.take(3000))
      assert(routed.schema("s").dataType === expectedType)
      assert(routed.collect() === expected)
      // decimal AVG must stay on the base (scale rules differ)
      val avgQ = spark.read.parquet(basePath)
        .groupBy("l_returnflag").agg(avg("price").as("a"))
      assert(avgQ.queryExecution.executedPlan.toString
               .contains("lineitem_base"))
    } finally ProjectionRouter.clear()
  }

  test("with several registered projections the cheapest qualifying one " +
       "serves each query (ClickHouse selection rule)") {
    GraftExtensions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-proj2")
      .toString
    val basePath = s"$dir/events_base"
    Tables(spark, sf("events"), "events")
      .select("event_id", "user_id", "event_type")
      .withColumn("uid_bucket", pmod(col("user_id"), lit(10)))
      .write.parquet(basePath)
    val byType = s"$dir/by_type"
    val byTypeBucket = s"$dir/by_type_bucket"
    ProjectionRouter.writeProjection(spark.read.parquet(basePath),
      Seq("event_type"), Seq("user_id"), byType)
    ProjectionRouter.writeProjection(spark.read.parquet(basePath),
      Seq("event_type", "uid_bucket"), Seq("user_id"), byTypeBucket)
    try {
      ProjectionRouter.register(ProjectionRouter.Projection(
        basePath, byType, Set("event_type"), Set("user_id")))
      ProjectionRouter.register(ProjectionRouter.Projection(
        basePath, byTypeBucket, Set("event_type", "uid_bucket"),
        Set("user_id")))
      // a by-type query qualifies for BOTH; the 1-key projection wins
      val q1 = spark.read.parquet(basePath).groupBy("event_type")
        .agg(sum("user_id").as("s"))
      assert(q1.queryExecution.executedPlan.toString.contains("by_type"))
      assert(!q1.queryExecution.executedPlan.toString
               .contains("by_type_bucket"))
      // a (type, bucket) query only the 2-key projection can serve
      val q2 = spark.read.parquet(basePath)
        .groupBy("event_type", "uid_bucket")
        .agg(sum("user_id").as("s"))
      assert(q2.queryExecution.executedPlan.toString
               .contains("by_type_bucket"))
      // both are answer-identical to the raw aggregation
      val raw2 = Tables(spark, sf("events"), "events")
        .select("event_id", "user_id", "event_type")
        .withColumn("uid_bucket", pmod(col("user_id"), lit(10)))
        .groupBy("event_type", "uid_bucket")
        .agg(sum("user_id").as("s"))
      assert(q2.exceptAll(raw2).count() === 0)
      assert(raw2.exceptAll(q2).count() === 0)
    } finally ProjectionRouter.clear()
  }

  test("streaming projection maintenance: per-batch partial merge keeps " +
       "the routed read fresh and exact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-psink")
      .toString
    val base = s"$dir/base"
    val proj = s"$dir/proj"
    val ckpt = s"$dir/ckpt"
    val stream = MemoryStream[(String, Long)]
    val q = Streaming.projectionSink(stream.toDS().toDF("k", "v"),
                                     base, proj, ckpt, Seq("k"), Seq("v"))
      .start()
    stream.addData(("a", 1L), ("a", 2L), ("b", 5L))
    q.processAllAvailable()
    stream.addData(("a", 10L), ("c", 7L)) // a merges across batches
    q.processAllAvailable()
    q.stop()
    // the maintained partials are exactly the raw-table aggregates
    val partials = spark.read.parquet(proj)
      .select("k", "cnt", "sum_v", "min_v", "max_v")
      .orderBy("k").as[(String, Long, Long, Long, Long)].collect()
    assert(partials === Array(("a", 3L, 13L, 1L, 10L),
                              ("b", 1L, 5L, 5L, 5L),
                              ("c", 1L, 7L, 7L, 7L)))
    try {
      GraftExtensions.register(spark)
      ProjectionRouter.register(ProjectionRouter.Projection(
        base, proj, Set("k"), Set("v")))
      val routed = spark.read.parquet(base).groupBy("k")
        .agg(count(lit(1)).as("n"), sum("v").as("s"),
             min("v").as("mn"), max("v").as("mx"))
        .orderBy("k")
      routed.collect()
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains("proj"), plan.take(3000))
      assert(!plan.contains("base"), plan.take(3000))
      assert(routed.as[(String, Long, Long, Long, Long)].collect()
               === partials)
    } finally ProjectionRouter.clear()
  }

  test("projectionSink crash recovery: an orphaned TAGGED tmp state " +
       "(crash between delete and rename — the tag always precedes the " +
       "delete) is promoted before the next merge; an UNTAGGED tmp is " +
       "a torn write and is discarded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-pcrash")
      .toString
    val base = s"$dir/base"
    val proj = s"$dir/proj"
    val fs = new org.apache.hadoop.fs.Path(proj)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate the crash window: the swap sealed the tmp (a real swap
    // creates the _merged_<id> tag BEFORE deleting the live dir),
    // deleted proj, and died before renaming the complete copy in
    Seq(("a", 2L, 3L, 1L, 2L, 2L))
      .toDF("k", "cnt", "sum_v", "min_v", "max_v", "nn_v")
      .write.parquet(proj + ".tmp")
    fs.create(new org.apache.hadoop.fs.Path(proj + ".tmp/_merged_prev"),
              true).close()
    val stream = MemoryStream[(String, Long)]
    val q = Streaming.projectionSink(stream.toDS().toDF("k", "v"),
                                     base, proj, s"$dir/ckpt",
                                     Seq("k"), Seq("v")).start()
    stream.addData(("a", 10L), ("b", 5L))
    q.processAllAvailable()
    q.stop()
    // the orphaned state was recovered, then merged with the new batch
    val partials = spark.read.parquet(proj)
      .select("k", "cnt", "sum_v", "min_v", "max_v")
      .orderBy("k").as[(String, Long, Long, Long, Long)].collect()
    assert(partials === Array(("a", 3L, 13L, 1L, 10L),
                              ("b", 1L, 5L, 5L, 5L)))
    // and the tmp dir was consumed by the swap, not left behind
    assert(!fs.exists(new org.apache.hadoop.fs.Path(proj + ".tmp")))
    // an UNTAGGED tmp beside a live store is a torn write (the writer
    // died before sealing it): dropped, live state merged as usual
    val dir2 = java.nio.file.Files.createTempDirectory("graft-pcrash2")
      .toString
    val proj2 = s"$dir2/proj"
    Seq(("zz", 99L, 99L, 99L, 99L, 99L))
      .toDF("k", "cnt", "sum_v", "min_v", "max_v", "nn_v")
      .write.parquet(proj2 + ".tmp") // no _merged_* tag
    val stream2 = MemoryStream[(String, Long)]
    val q2 = Streaming.projectionSink(stream2.toDS().toDF("k", "v"),
                                      s"$dir2/base", proj2,
                                      s"$dir2/ckpt", Seq("k"), Seq("v"))
      .start()
    stream2.addData(("a", 1L))
    q2.processAllAvailable()
    q2.stop()
    val got2 = spark.read.parquet(proj2)
      .select("k", "cnt", "sum_v").orderBy("k")
      .as[(String, Long, Long)].collect()
    assert(got2 === Array(("a", 1L, 1L))) // torn rows did NOT leak in
  }

  test("the packaged q_projection_route really executes through the " +
       "projection files (the oracle alone can't tell)") {
    try {
      val df = CoreQueries.queries("q_projection_route")(spark, sf("orders"))
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("orders_by_priority"), plan.take(3000))
      assert(!plan.contains("orders.parquet"), plan.take(3000))
    } finally ProjectionRouter.clear()
  }
}
