package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the harness parquet tables (TESTDATA.md / FIXTURES.md §B).
  *
  * These stand in for the reference's source/sink tables: the columnar final
  * store of the CDC pipeline (ClickHouse MergeTree in
  * `/root/reference/README.md:176`) is modeled as parquet (SURVEY.md S6).
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Harness generators have shipped timestamps three ways across rounds:
    // parquet TIMESTAMP(NANOS) (readable only via nanosAsLong=true),
    // timezone-naive TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ), and
    // UTC-adjusted micros (plain TimestampType). Normalize all three to
    // TimestampType at micro precision — the session TZ is pinned to UTC,
    // so the NTZ→LTZ cast is an identity on the stored micros value and
    // DuckDB (which reads every variant as naive TIMESTAMP) keeps seeing
    // bit-identical instants.
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Read timezone-naive micros DIRECTLY as TimestampType instead of
    // TIMESTAMP_NTZ: with the session TZ pinned to UTC the reinterpretation
    // is an identity on the stored micros, and it removes the NTZ→LTZ cast
    // projection the fold below would otherwise insert between every
    // date/ts filter and the parquet scan — that cast blocked predicate
    // pushdown on o_orderdate/l_shipdate/ts after the fixture regen
    // switched physical types (observed: q_tpch_q4 0.51→0.99 s at sf0.1
    // until this line restored the pushdown).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case org.apache.spark.sql.types.LongType if f.name == "ts" =>
          // int64 nanos (legacy reader mode): truncate to micros, the same
          // truncation DuckDB applies reading NANOS as TIMESTAMP.
          d.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          d.withColumn(f.name, col(f.name).cast("timestamp"))
        case _ => d
      }
    }
  }

  /** Synthesized TPC-H `partsupp`: the harness schema omits the relation,
    * which blocked the last three official TPC-H shapes (Q11/Q16/Q20).
    * Deterministic stand-in: one row per distinct (l_partkey, l_suppkey)
    * observed in lineitem; `ps_availqty` ∈ [1, 9999] and
    * `ps_supplycost_cents` ∈ [100, 99999] derive from portable md5-prefix
    * hashes, so a DuckDB oracle rebuilds the identical relation
    * bit-for-bit. Supply cost is integer CENTS (BIGINT) rather than a
    * decimal: all downstream sums/threshold compares stay in exact
    * integer arithmetic — order-independent and engine-portable (Q11's
    * having-threshold scales both sides by the same 100).
    *
    * The distinct is one hash aggregate with map-side combine; in a real
    * deployment partsupp is a first-class source table, so the derivation
    * is memoized per (session, dir) behind a localCheckpoint — Q11 reads
    * it twice (main + threshold subquery) and the three partsupp shapes
    * share one materialization instead of re-deriving per branch.
    */
  def partsupp(spark: SparkSession, dir: String): DataFrame = {
    // lazily evict entries pinned by STOPPED sessions — their checkpoint
    // blocks died with the context, and the map must not keep dead
    // sessions (plus their derived relations) reachable for the JVM's
    // lifetime. Callers that REWRITE a source dir must call
    // [[invalidatePartsupp]]: the cache intentionally serves the
    // derivation as of first read, like any materialized relation.
    psCache.removeIf(k => k._1.sparkContext.isStopped)
    psCache.getOrElseCompute((spark, dir))(
      apply(spark, dir, "lineitem")
        .select(col("l_partkey").as("ps_partkey"),
                col("l_suppkey").as("ps_suppkey"))
        .distinct()
        .select(col("ps_partkey"), col("ps_suppkey"),
          (conv(substring(md5(concat_ws("_", col("ps_partkey"),
             col("ps_suppkey"))), 1, 8), 16, 10).cast("long") % 9999 + 1)
            .cast("int").as("ps_availqty"),
          (conv(substring(md5(concat_ws("#", col("ps_suppkey"),
             col("ps_partkey"))), 1, 8), 16, 10).cast("long") % 99900 + 100)
            .as("ps_supplycost_cents"))
        .localCheckpoint())
  }

  /** Drop the memoized partsupp derivation for (session, dir) — call
    * after rewriting the underlying lineitem data.
    */
  def invalidatePartsupp(spark: SparkSession, dir: String): Unit =
    psCache.removeIf(_ == ((spark, dir)))
    // (the dropped entry's checkpoint blocks are reclaimed by the
    // ContextCleaner once unreferenced)

  private val psCache =
    new BoundedMemo[(SparkSession, String), DataFrame](32)
}
