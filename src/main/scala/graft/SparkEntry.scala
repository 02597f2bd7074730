package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the themed packs (one entry per implemented
  * operator from SURVEY.md §2); `oracleSql` carries the DuckDB-equivalent
  * SQL for every hash-checkable key.
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    CoreQueries, CdcQueries, JoinQueries, AggQueries, WindowQueries,
    FunctionQueries, StreamingQueries, LlmQueries, SourceQueries,
    TpchQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The reference's own scenario end-to-end (SURVEY.md §7.3): treat
    * `events` as a CDC change stream (entity=user_id, version=ts), convert
    * wire-format epoch micros to truncated timestamps (P2), collapse to
    * latest state per entity (U1), aggregate by category (A1), order (O1).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val wire = Tables(spark, dir, "events")
      .withColumn("updated_at_us", unix_micros(col("ts")))
    val decoded = wire.withColumn(
      "updated_at", Functions.microsToTimestampSecond(col("updated_at_us")))
    Cdc.latest(decoded, Seq("user_id"), Seq(col("ts"), col("event_id")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_users"),
           round(sum("value"), 4).as("total_value"))
      .orderBy("event_type")
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(_.queries).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    packs.map(_.oracles).reduce(_ ++ _)
}
