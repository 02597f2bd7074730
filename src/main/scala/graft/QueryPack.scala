package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A themed group of driver-verifiable queries (SURVEY.md §2 inventory).
  *
  * Contract (see SparkEntry / Verify): every key in [[queries]] that is
  * DuckDB-expressible also appears in [[oracles]] with ANSI SQL producing
  * the SAME column names and a deterministic row order (explicit ORDER BY
  * with explicit NULLS FIRST/LAST on every key — Spark defaults to nulls
  * first on ASC / nulls last on DESC, DuckDB defaults to nulls last).
  *
  * Determinism rules (SURVEY.md §5):
  *  - money sums go through DECIMAL(18,2) then cast to double (exact in
  *    both engines regardless of partial-aggregation order);
  *  - free-form double aggregates are round()ed;
  *  - every ORDER BY ends in a unique tie-break key.
  */
trait QueryPack {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracles: Map[String, String]
}
