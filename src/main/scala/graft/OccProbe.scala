package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Occurrence-level probe for the PPJoin prefix branch (driver tooling,
  * like [[StageProbe]]): counts, on `SPARK_GRAFT_SF_DIR`'s documents
  * table at `SPARK_GRAFT_T` (default 0.2 — `q_dedup_ngram_jaccard`'s
  * knobs), the prefix-candidate join's occurrence rows, how many of
  * them the positional filter lets through to the sorted-intersect
  * verify, and the distinct candidate pair count under each — the §6.1
  * evidence for how much of the in-join verify the positional bound
  * removes, measured on the real corpus rather than estimated.
  */
object OccProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft-sf1-rg")
    val t = sys.env.getOrElse("SPARK_GRAFT_T", "0.2").toDouble
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Relational.harnessSession(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      )
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, sfDir, "documents")
    val sh = docs
      .select(col("doc_id").as("doc"), col("lang").as("part"),
              explode(LlmOps.shingles(LlmOps.tokens(col("text")), 3))
                .as("s0"))
      .select(col("doc"), col("part"), xxhash64(col("s0")).as("s"))
    val occ = LlmOps.prefixOccurrences(sh, t)
    val row = occ.agg(
      count(lit(1)).as("occ_total"),
      sum(when(col("__survives"), 1L).otherwise(0L)).as("occ_surviving"),
      approx_count_distinct(concat_ws(":", col("a"), col("b")), 0.01)
        .as("pairs_total"),
      approx_count_distinct(
        when(col("__survives"), concat_ws(":", col("a"), col("b"))), 0.01)
        .as("pairs_surviving")).head()
    // pairs_* are approx_count_distinct at rsd 0.01 (±1 %) — the JSON
    // keys say so, and any prose quoting them must carry the ±1 % label
    // (the occ_* counts are exact)
    println(s"""[occ] {"dir":"$sfDir","t":$t,"occ_total":${row.getLong(0)
      },"occ_surviving":${row.getLong(1)},"pairs_total_approx1pct":${
        row.getLong(2)},"pairs_surviving_approx1pct":${row.getLong(3)}}""")
    spark.stop()
  }
}
