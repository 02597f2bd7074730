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
}
