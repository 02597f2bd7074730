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

  /** CollapsingMergeTree-analog read (the other MergeTree engine the
    * reference's target commonly uses next to ReplacingMergeTree,
    * `/root/reference/README.md:176`): the change stream carries
    * `sign` = +1 (state row) / -1 (cancellation of the previous state).
    * Current state per `keys` tuple = the highest-`version` sign=+1 row,
    * kept only while the key's net sign is positive (every state row
    * cancelled ⇒ entity deleted).
    *
    * ONE hash aggregate computes both the net and the surviving row:
    * `max(when(sign=1, struct(version ++ payload)))` — the struct compares
    * lexicographically on the version columns, so its max IS the latest
    * state; map-side partial aggregation means raw rows combine before the
    * single key-space shuffle. No window, no second pass — at 100 TB this
    * is strictly cheaper than [[latest]] (aggregate vs window sort).
    */
  def collapse(df: DataFrame, keys: Seq[String], sign: Column,
               version: Seq[String], payload: Seq[String]): DataFrame = {
    val state = struct((version ++ payload).map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(sum(sign).cast("long").as("net"),
           max(when(sign === 1, state)).as("__state"))
      .filter(col("net") > 0 && col("__state").isNotNull)
      .select(keys.map(col) ++
        (version ++ payload).map(c => col(s"__state.`$c`").as(c)) :+
        col("net"): _*)
  }

  /** VersionedCollapsingMergeTree-analog read: +1/-1 pairs cancel only
    * within the SAME (keys, versionCols) tuple, so out-of-order delivery
    * of cancels for older versions never kills a newer state. Returns the
    * surviving version rows (net > 0 per tuple); feed the result to
    * [[latest]] for the current-state view.
    */
  def collapseVersioned(df: DataFrame, keys: Seq[String],
                        versionCols: Seq[String], sign: Column,
                        payload: Seq[String]): DataFrame = {
    val state = struct(payload.map(col): _*)
    val grp = keys ++ versionCols
    df.groupBy(grp.map(col): _*)
      .agg(sum(sign).cast("long").as("net"),
           max(when(sign === 1, state)).as("__state"))
      .filter(col("net") > 0 && col("__state").isNotNull)
      .select(grp.map(col) ++
        payload.map(c => col(s"__state.`$c`").as(c)) :+ col("net"): _*)
  }

  /** MergeTree `TTL … GROUP BY` analog: rows whose `tsCol` falls before
    * `cutoff` collapse to one row per (`keys`, `bucket`) with the additive
    * `sums` columns summed (ClickHouse's `TTL ts + INTERVAL x GROUP BY k
    * SET v = sum(v)` merge-time rewrite); newer rows pass through
    * untouched with n = 1. Deterministic by design: the caller supplies
    * the as-of cutoff instead of now(), so the same input always yields
    * the same table (and an oracle can check it). Expired rows shrink via
    * one hash aggregate; live rows never shuffle. Sums go through DECIMAL
    * so the rollup is exact regardless of partial-aggregation order.
    */
  def ttlRollup(df: DataFrame, tsCol: String, cutoff: Column,
                keys: Seq[String], bucket: Column,
                sums: Seq[String]): DataFrame = {
    val expired = df.filter(col(tsCol) < cutoff)
      .groupBy(keys.map(col) :+ bucket.as(tsCol): _*)
      .agg(count(lit(1)).as("n"),
           sums.map(c => sum(col(c).cast("decimal(18,4)")).cast("double")
             .as(c)): _*)
    val live = df.filter(col(tsCol) >= cutoff)
      .select(keys.map(col) ++ Seq(col(tsCol), lit(1L).as("n")) ++
        sums.map(c => col(c).cast("double").as(c)): _*)
    live.unionByName(expired)
  }

  /** Plain MergeTree `TTL` row expiry (no GROUP BY): drop rows older than
    * the explicit as-of cutoff. */
  def ttlExpire(df: DataFrame, tsCol: String, cutoff: Column): DataFrame =
    df.filter(col(tsCol) >= cutoff)

  /** GraphiteMergeTree-style multi-tier retention: each row lands in the
    * first (newest) tier whose lower bound it reaches and is bucketed at
    * that tier's precision — e.g. raw below 1 year of age, monthly below
    * 4 years, yearly beyond. `tiers` is newest-first (lowerBoundInclusive,
    * bucketExpr); `oldestBucket` catches everything older. The whole
    * downsampling pass is ONE hash aggregate over a CASE bucket — tier
    * count never adds passes, and the newest tier can keep raw precision
    * by bucketing on the timestamp itself. Sums go through DECIMAL
    * (order-independent), cutoffs are explicit (deterministic, oracle-able).
    */
  def retentionRollup(df: DataFrame, tsCol: String, keys: Seq[String],
                      sums: Seq[String], tiers: Seq[(Column, Column)],
                      oldestBucket: Column): DataFrame = {
    val bucket = tiers.reverse.foldLeft(oldestBucket) {
      case (older, (minTs, b)) => when(col(tsCol) >= minTs, b).otherwise(older)
    }
    df.groupBy(keys.map(col) :+ bucket.as(tsCol): _*)
      .agg(count(lit(1)).as("n"),
           sums.map(c => sum(col(c).cast("decimal(18,4)")).cast("double")
             .as(c)): _*)
  }

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
