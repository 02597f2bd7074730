package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The mechanical whitelist checks behind `Explain audit`: a
  * whitelisted key is only exempt while its plan still satisfies its
  * own justification — these tests pin both directions (a violating
  * plan IS flagged, the justified shapes are NOT).
  */
class ExplainAuditSpec extends SparkSpec {

  // the audit runs with AQE off for the same reason (see Explain.main):
  // the adaptive wrapper's pre-EnsureRequirements tree has no exchange
  // nodes, which would blind the SinglePartition checks
  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
  }

  override def afterAll(): Unit = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    super.afterAll()
  }

  test("unjustifiedSinglePartition: a raw-scan global window is " +
       "flagged; an aggregate-fed exchange is justified") {
    val df = spark.range(100).toDF("x")
    // the classic 100 TB killer: un-partitioned ranking window funnels
    // RAW rows through one task
    val raw = df.withColumn("rn", row_number().over(Window.orderBy("x")))
    assert(Explain.unjustifiedSinglePartition(
      raw.queryExecution.executedPlan).nonEmpty)
    // a global aggregate's SinglePartition exchange moves one partial
    // row per upstream partition — the justified shape
    val agg = df.agg(sum("x").as("s"))
    assert(Explain.unjustifiedSinglePartition(
      agg.queryExecution.executedPlan).isEmpty)
    // bounded-input window: the exchange input went through a limit
    val limited = df.limit(5)
      .withColumn("rn", row_number().over(Window.orderBy("x")))
    assert(Explain.unjustifiedSinglePartition(
      limited.queryExecution.executedPlan).isEmpty)
  }

  test("unjustifiedNestedLoop: broadcasting a raw relation is flagged; " +
       "limit / point-filter / one-row-aggregate sides are justified") {
    val a = spark.range(50).toDF("x")
    val b = spark.range(50).toDF("y")
    val bad = a.crossJoin(broadcast(b))
    assert(Explain.unjustifiedNestedLoop(
      bad.queryExecution.executedPlan).nonEmpty)
    val viaLimit = a.crossJoin(broadcast(b.limit(3)))
    assert(Explain.unjustifiedNestedLoop(
      viaLimit.queryExecution.executedPlan).isEmpty)
    val viaPoint = a.crossJoin(broadcast(b.filter(col("y") === 7)))
    assert(Explain.unjustifiedNestedLoop(
      viaPoint.queryExecution.executedPlan).isEmpty)
    val viaSeedRange = a.crossJoin(broadcast(b.filter(col("y") < 8)))
    assert(Explain.unjustifiedNestedLoop(
      viaSeedRange.queryExecution.executedPlan).isEmpty)
    val viaAgg = a.crossJoin(broadcast(b.agg(count(lit(1)).as("n"))))
    assert(Explain.unjustifiedNestedLoop(
      viaAgg.queryExecution.executedPlan).isEmpty)
    // a LARGE comparison literal proves nothing — still flagged
    val bigRange = a.crossJoin(broadcast(b.filter(col("y") < 1000000)))
    assert(Explain.unjustifiedNestedLoop(
      bigRange.queryExecution.executedPlan).nonEmpty)
    // an INVERTED point shape keeps nearly all rows — the EqualTo
    // inside the Not must not certify the filter
    val negated = a.crossJoin(broadcast(b.filter(col("y") =!= 7)))
    assert(Explain.unjustifiedNestedLoop(
      negated.queryExecution.executedPlan).nonEmpty)
    // a disjunction widens the seed range arbitrarily — not a conjunct
    val disjunct = a.crossJoin(broadcast(
      b.filter(col("y") < 8 || col("y") > 40)))
    assert(Explain.unjustifiedNestedLoop(
      disjunct.queryExecution.executedPlan).nonEmpty)
    // a fractional threshold is a selectivity filter on a value
    // column, not a seed range — flagged
    val frac = a.crossJoin(broadcast(
      b.filter(col("y").cast("double") / 100.0 < 0.9)))
    assert(Explain.unjustifiedNestedLoop(
      frac.queryExecution.executedPlan).nonEmpty)
  }

  test("scan pruning: a pushed-down parquet filter certifies scanPruned; " +
       "a deliberately broken filter-over-bare-scan is flagged; healthy " +
       "plans are not") {
    import org.apache.spark.sql.catalyst.expressions.{EqualTo, Literal}
    import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec}
    val docs = Tables(spark, sf("documents"), "documents")
    // healthy pushdown: the predicate reaches the scan
    val pushed = docs.filter(col("doc_id") === 7L)
      .queryExecution.executedPlan
    assert(Explain.scanPruned(pushed))
    assert(Explain.unpushedFilterOverScan(pushed).isEmpty)
    // a bare scan proves nothing
    val bare = docs.queryExecution.executedPlan
    assert(!Explain.scanPruned(bare))
    assert(Explain.unpushedFilterOverScan(bare).isEmpty)
    // DELIBERATELY BROKEN pushdown: a FilterExec carrying a clearly
    // pushable attribute=literal conjunct stacked directly on a scan
    // that received no data/partition filters — the audit must flag it
    val scan = Explain.walk(bare)
      .collectFirst { case s: FileSourceScanExec => s }.get
    assert(scan.dataFilters.isEmpty && scan.partitionFilters.isEmpty)
    val broken = FilterExec(
      EqualTo(scan.output.find(_.name == "doc_id").get, Literal(7L)), scan)
    assert(Explain.unpushedFilterOverScan(broken).nonEmpty)
    // a non-pushable (derived/disjunctive) residual above a bare scan
    // is legitimate — no false flag
    val residual = FilterExec(
      org.apache.spark.sql.catalyst.expressions.Or(
        EqualTo(scan.output.find(_.name == "doc_id").get, Literal(7L)),
        EqualTo(scan.output.find(_.name == "lang").get, Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString("en"),
          org.apache.spark.sql.types.StringType))), scan)
    assert(Explain.unpushedFilterOverScan(residual).isEmpty)
  }

  test("column pruning: the metadata-only media read never scans the " +
       "payload source column; a payload read does") {
    val metaPlan = SparkEntry.queries("q_multimodal_meta")(
      spark, sf("documents"))
    assert(!Explain.scanReadsColumn(
      metaPlan.queryExecution.executedPlan, "text"))
    val full = Tables(spark, sf("documents"), "documents")
      .select("doc_id", "text")
    assert(Explain.scanReadsColumn(
      full.queryExecution.executedPlan, "text"))
  }

  test("audit-aqe walk: the executed-plan descent sees the exchanges " +
       "inside query stages that the static inputPlan descent is blind " +
       "to after execution") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val df = Tables(spark, sf("documents"), "documents")
        .groupBy("lang").count()
      df.collect() // drive AQE to the runtime-final plan
      val phys = df.queryExecution.executedPlan
      assert(phys.isInstanceOf[AdaptiveSparkPlanExec])
      val finalNodes = Explain.walk(phys, aqeFinal = true)
      // the final plan's shuffle lives inside a query-stage boundary —
      // the aqeFinal walk descends into it
      assert(finalNodes.exists(_.isInstanceOf[ShuffleExchangeExec]))
      // and the full flag set runs clean on the executed plan
      assert(Explain.auditFlags("spec_groupby", phys,
                                aqeFinal = true).isEmpty)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "false")
  }
}
