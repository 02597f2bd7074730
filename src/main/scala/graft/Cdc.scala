package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC merge / upsert / dedup — the reference's signature operator family.
  *
  * The reference's final table is `ReplacingMergeTree ORDER BY (user_id,
  * updated_at)` (`/root/reference/README.md:176-177`): background merges
  * keep, per sorting-key tuple, only the last-inserted version; reading the
  * current state requires collapsing versions at query time (merges are
  * async). We expose both semantics explicitly (SURVEY.md §2.3 U1-U4):
  *
  *  - [[latest]]     — U1/U3: one row per entity key, highest version wins
  *                     (equivalent to ClickHouse `SELECT ... FINAL`).
  *  - [[dedupVersions]] — U2: collapse duplicate (key, version) tuples,
  *                     last-arriving row wins (tie-break = arrival order,
  *                     e.g. kafka offset, `README.md:229`).
  *  - history        — U4: the raw append table IS the type-2 history; no
  *                     operator needed beyond plain reads.
  *
  * Scale notes: both operators are a single hash-shuffle on the entity key
  * followed by a per-key sort — no driver-side state, no collect. At 100 TB
  * the shuffle is unavoidable (it IS the merge); skewed entities are handled
  * by AQE skew-split since each window only needs its own key's rows.
  */
object Cdc {

  /** One row per `keys` tuple: the row with the highest `version` columns
    * (compared lexicographically, descending). Deterministic iff the
    * version tuple is unique per key — include an arrival-order column
    * (offset) as the last version component to guarantee that.
    */
  def latest(df: DataFrame, keys: Seq[String], version: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(version.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Collapse rows with identical (keys ++ versionCols) tuples, keeping the
    * row with the highest `arrival` value — ReplacingMergeTree's
    * no-version-column rule ("last inserted wins",
    * `/root/reference/README.md:176`) made deterministic via arrival order.
    */
  def dedupVersions(df: DataFrame, keys: Seq[String], versionCols: Seq[String],
                    arrival: Column): DataFrame =
    latest(df, keys ++ versionCols, Seq(arrival))

  /** Rows-per-key change history stats (U4): the append table doubles as a
    * type-2 history because the version column is part of the sorting key
    * (`/root/reference/README.md:177`).
    */
  def historyStats(df: DataFrame, key: String, version: Column): DataFrame =
    df.groupBy(key).agg(
      count(lit(1)).as("n_versions"),
      min(version).as("first_version"),
      max(version).as("last_version"))

  /** Compaction job: materialize the latest-state view so readers skip the
    * per-query version collapse — the explicit form of ReplacingMergeTree's
    * background merges (`/root/reference/README.md:176`, which are async
    * and best-effort; this is deterministic). Output is clustered on the
    * entity keys (sortWithinPartitions → parquet min/max row-group
    * skipping), mirroring the reference's ORDER-BY clustering.
    */
  def compact(df: DataFrame, keys: Seq[String], version: Seq[Column],
              path: String): Unit =
    latest(df, keys, version)
      .sortWithinPartitions(keys.map(col): _*)
      .write.mode("overwrite").parquet(path)
}
