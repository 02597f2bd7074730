package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects. Read the raw int64 nanos and truncate to micro
      // precision — the same truncation DuckDB applies when it reads the
      // column as TIMESTAMP, so oracle comparisons stay bit-identical.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
