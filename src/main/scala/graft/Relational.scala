package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational building blocks that need more than a one-line Spark call
  * (SURVEY.md §2.4-2.7). Everything else in those sections maps directly to
  * a built-in and is exercised from the query pack.
  */
object Relational {

  /** A single-partition window made EXPLICIT — for relations already
    * bounded to a small row count by construction (a preceding
    * `limit(k)`, a ≤-buckets pre-aggregate, a per-source quota table).
    * Partitioning by a literal executes identically to the bare
    * `Window.orderBy` (one partition — which the bound justifies) but
    * (a) declares the justification at the call site and (b) keeps
    * `WindowExec`'s "No Partition Defined" warning out of bench logs,
    * so that warning stays a REAL signal for unbounded windows that
    * should be using [[globalRowNumberAuto]]/[[globalPrefixSumAuto]].
    *
    * Property (b) needs help on Spark 4.1+: the optimizer rule
    * `EliminateWindowPartitions` (SPARK-46941) strips FOLDABLE
    * partition expressions, turning this right back into the bare
    * warning-emitting form — and every non-foldable constant dressing
    * (`when(c.isNotNull, 0).otherwise(0)` et al.) is one
    * NullPropagation/SimplifyConditionals pass away from folding too.
    * So the literal stays, and the harness sessions that read their
    * own logs (Bench/Verify/StageProbe/MemPressure/Smoke/Explain)
    * exclude that rule via [[KeepBoundedWindowConf]] — plans and
    * results are identical either way (one partition regardless; the
    * rule is a plan-cosmetic), but the partition spec survives to
    * `WindowExec` and the warning stays a real signal. A library user
    * who wants the same log hygiene sets the same conf.
    */
  def boundedWindow(order: Column*): org.apache.spark.sql.expressions
      .WindowSpec =
    Window.partitionBy(lit(0)).orderBy(order: _*)

  /** (conf key, value) every graft harness session sets so
    * [[boundedWindow]]'s literal partition spec survives optimization —
    * see the doc there. Harness sessions ASSIGN this conf outright
    * (they own their session and exclude no other rules); a library
    * user who already excludes rules should comma-append this one to
    * their existing `spark.sql.optimizer.excludedRules` value instead.
    */
  val KeepBoundedWindowConf: (String, String) =
    ("spark.sql.optimizer.excludedRules",
     "org.apache.spark.sql.catalyst.optimizer.EliminateWindowPartitions")

  /** (conf key, value) every graft harness session sets so AQE converts
    * planned sort-merge joins into shuffled-hash joins per-join when the
    * MEASURED build-side partitions fit under 64 MB (the advisory
    * partition size, the pairing Spark's docs recommend). This replaces
    * the r14 static `shuffle_hash` hints on the corpus-sized array-
    * carrying candidate joins (minhash buckets, ngram prefixes): a
    * forced hash build is an OOM cliff once build bytes outgrow
    * partitions × memory — the r15 ngram 100× single died in
    * `ShuffledHashJoinExec.buildHashedRelation` — while the AQE form
    * keeps the hash build exactly where it is measured safe and sorts
    * (spillable, skew-splittable) where it is not. At scale the knob
    * composes with sizing `spark.sql.shuffle.partitions` to the data,
    * per the 100 TB partitioning discipline in SURVEY §6.
    */
  val AdaptiveHashJoinConf: (String, String) =
    ("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
     (64L * 1024 * 1024).toString)

  /** (conf key, value) lowering AQE's post-shuffle coalescing floor from
    * the 1 MB default to 64 KB. AQE's partition coalescing is BYTE-based
    * (`parallelismFirst` keeps partitions down to
    * `coalescePartitions.minPartitionSize`), which misjudges
    * COMPUTE-DENSE relations at any scale: a shuffle of candidate pairs
    * or signature rows carrying shingle-hash arrays is ~1-2 MB per
    * million intersect operations, so the 1 MB floor coalesces the
    * verify/aggregate stage to 1-2 tasks and serializes minutes of CPU
    * behind a kilobyte-sized exchange (r16 StageProbe: the two 1.75 s
    * single-task stages in q_dedup_minhash_dupclass, wall −8× once
    * spread). 64 KB keeps such stages at the session's parallelism while
    * still collapsing genuinely trivial (< 64 KB/task) shuffles; for
    * byte-bound relations nothing changes (they blow past both floors
    * and `advisoryPartitionSizeInBytes` governs). Scale note: the floor
    * is per-PARTITION, so it adds at most (shuffle bytes / 64 KB) tasks
    * — bounded by `spark.sql.shuffle.partitions`, which production sizes
    * to the data (SURVEY §6); a cluster wanting byte-efficient packing
    * on a busy host overrides this (and `parallelismFirst`) per the
    * Spark tuning guide.
    */
  val ComputeDenseCoalesceConf: (String, String) =
    ("spark.sql.adaptive.coalescePartitions.minPartitionSize",
     (64L * 1024).toString)

  /** The conf pairs above, in one place: every graft harness main
    * (Bench, Verify, Smoke, Explain, MemPressure, StageProbe, OccProbe)
    * applies exactly this list via [[harnessSession]], so the next
    * harness-wide conf lands in one definition site. Values are
    * ASSIGNED (see [[KeepBoundedWindowConf]]'s doc on append-vs-assign).
    */
  val SessionDefaults: Seq[(String, String)] =
    Seq(KeepBoundedWindowConf, AdaptiveHashJoinConf,
        ComputeDenseCoalesceConf)

  /** Apply [[SessionDefaults]] to a session builder. */
  def harnessSession(b: org.apache.spark.sql.SparkSession.Builder)
      : org.apache.spark.sql.SparkSession.Builder =
    SessionDefaults.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }

  /** `row_number()` over [[boundedWindow]] — the bounded-relation rank. */
  def boundedRank(order: Column*): Column =
    row_number().over(boundedWindow(order: _*))

  /** Scale-adaptive read-spread for SCAN-STAGE fan-out producers (the
    * shingle/signature/coordinate exploders, whose per-input-row work is
    * 10²-10³× the input bytes): when a narrow (scan/filter/project-only)
    * input arrives in fewer partitions than the session's default
    * parallelism, repartition it once before the fan-out — the tuning
    * guide's fix for unsplittable inputs ("one huge unsplittable file →
    * repartition immediately after the read"). The harness fixtures are
    * single-row-group parquet (one task per scan regardless of splits),
    * which otherwise serializes the whole derivation chain: r16
    * StageProbe measured the minhash signature aggregate and the PCA
    * coordinate explode each running 1-2 s single-task at sf0.1.
    *
    * No-op (returns `df` unchanged, no added Exchange) when the input
    * already carries ≥ defaultParallelism partitions — i.e. on any real
    * multi-file/multi-row-group corpus — so at 100 TB this never
    * shuffles the corpus. Also a deliberate no-op when the lineage
    * already contains an exchange: post-shuffle parallelism is AQE's
    * job ([[ComputeDenseCoalesceConf]]), and inspecting partition
    * counts through an adaptive plan would execute its query stages.
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val plan = df.queryExecution.sparkPlan
    val wide = plan.collectFirst {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }.nonEmpty || plan.subqueries.nonEmpty
    if (wide) df
    else if (df.queryExecution.toRdd.getNumPartitions >= target) df
    else df.repartition(target)
  }

  /** As-of join (SURVEY.md J6): for each left row, attach the payload of the
    * latest right row with the same `key` and `rightTs <= leftTs`.
    *
    * Implemented as union + sort + last(ignoreNulls) over a per-key window —
    * a single shuffle on the key, NO nested-loop / range join. This is the
    * 100 TB-safe formulation: cost is one hash exchange + per-key sort,
    * independent of the time-overlap fan-out that makes range joins explode.
    *
    * Right rows sort before left rows at equal timestamps (`<=` semantics).
    * Left rows with no prior right match are dropped (inner as-of).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightPayload: Seq[String]): DataFrame = {
    val (unioned, payload) =
      asofUnion(left, right, key, leftTs, rightTs, rightPayload)
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(unioned)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    asofFinish(filled.drop("__t", "__side"), payload, rightPayload)
  }

  /** Forward as-of join (pandas merge_asof direction='forward'): for
    * each left row, the EARLIEST right row with the same key and
    * `rightTs >= leftTs` — the "next event after" lookup (next fill
    * after an order, next deploy after an alert). Same single-shuffle
    * union+window mechanics as [[asofJoin]], with the window order
    * REVERSED (descending time, rights before lefts at equal times so
    * `>=` includes the simultaneous right): the running last(ignoreNulls)
    * then carries the nearest FOLLOWING right payload backwards.
    *
    * `strict = true` flips the equal-time tiebreak (lefts before rights
    * in the descending scan), so the match condition tightens to
    * `rightTs > leftTs` — the form event-chain searches need when a row
    * must not match itself ([[Analytics.funnelSliding]]).
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
                      leftTs: String, rightTs: String,
                      rightPayload: Seq[String],
                      strict: Boolean = false): DataFrame = {
    val (unioned, payload) =
      asofUnion(left, right, key, leftTs, rightTs, rightPayload)
    val w = Window.partitionBy(key)
      .orderBy(col("__t").desc,
               if (strict) col("__side").desc else col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(unioned)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    asofFinish(filled.drop("__t", "__side"), payload, rightPayload)
  }

  /** Hot-key-safe FORWARD as-of join: [[asofJoinForward]] through the
    * bucketed three-pass plan via time negation — forward(t) is
    * backward(−t), the duality RelationalSpec pins for the single-window
    * forms, so the negated stream reuses [[asofJoinBucketed]] verbatim
    * and inherits its bound (per-task rows ∝ bucket width, never a hot
    * key's event count). Timestamps must be NUMERIC (negatable);
    * `bucketOf` sees the NEGATED time and only needs to stay monotone
    * (floor/div bucketing is — the half-width bucket pair around zero
    * is harmless, buckets only have to partition time monotonically).
    */
  def asofJoinForwardBucketed(left: DataFrame, right: DataFrame,
                              key: String, leftTs: String,
                              rightTs: String,
                              rightPayload: Seq[String],
                              bucketOf: Column => Column): DataFrame = {
    val l = left.withColumn("__negt", -col(leftTs))
    val r = right.withColumn("__negt", -col(rightTs))
    asofJoinBucketed(l, r, key, "__negt", "__negt", rightPayload,
                     bucketOf)
      .drop("__negt")
  }

  /** NEAREST as-of join (pandas merge_asof direction='nearest'): for
    * each left row, the right row with the same key minimizing
    * |rightTs − leftTs|; the BACKWARD candidate wins distance ties (the
    * deterministic contract, matching pandas). Still ONE shuffle: both
    * directions fill over the SAME unioned, key-partitioned frame — an
    * ascending backward carry and a descending forward carry are two
    * window passes over one exchange, never two joins plus a re-join.
    * Inner semantics: left rows with no right row on either side drop.
    */
  def asofJoinNearest(left: DataFrame, right: DataFrame, key: String,
                      leftTs: String, rightTs: String,
                      rightPayload: Seq[String]): DataFrame = {
    // pre-reduce the right side to ONE row per (key, instant) — the
    // min-struct of the payload decides simultaneous right rows
    // deterministically (the funnel family's min_by contract); without
    // it the window's tie order is shuffle-dependent and the two
    // directional carries could even pick DIFFERENT simultaneous rows
    val rightOne = right
      .groupBy(col(key), col(rightTs))
      .agg(min(struct(rightPayload.map(col): _*)).as("__p"))
      .select(col(key) +: col(rightTs) +:
                rightPayload.map(c => col(s"__p.$c").as(c)): _*)
    // carry the matched right timestamp as an extra payload so each left
    // row can compare its backward and forward candidate distances
    val rightPlus = rightOne.withColumn("__rts", col(rightTs))
    val (unioned, payload) =
      asofUnion(left, rightPlus, key, leftTs, rightTs,
                rightPayload :+ "__rts")
    val wb = Window.partitionBy(key).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(key)
      .orderBy(col("__t").desc, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(unioned)((d, c) =>
      d.withColumn(s"__b_$c", last(col(c), ignoreNulls = true).over(wb))
        .withColumn(s"__f_$c", last(col(c), ignoreNulls = true).over(wf)))
    val bt = col("__b___r___rts")
    val ft = col("__f___r___rts")
    val useBack = ft.isNull ||
      (bt.isNotNull && (col("__t") - bt) <= (ft - col("__t")))
    val matched = filled.filter(col("__side") === 1)
      .filter(bt.isNotNull || ft.isNotNull)
    val withPicks = rightPayload.foldLeft(matched)((d, c) =>
      d.withColumn(s"asof_$c",
                   when(useBack, col(s"__b___r_$c"))
                     .otherwise(col(s"__f___r_$c"))))
    withPicks.drop(
      (Seq("__t", "__side") ++ payload ++
        payload.flatMap(c => Seq(s"__b_$c", s"__f_$c"))): _*)
  }

  /** Shared stage of the as-of joins: both sides unioned into one frame
    * with `__t` (event time), `__side` (0 = right, 1 = left; rights sort
    * first at equal times for `<=` semantics) and the right payload as
    * null-padded `__r_*` columns.
    */
  private def asofUnion(left: DataFrame, right: DataFrame, key: String,
                        leftTs: String, rightTs: String,
                        rightPayload: Seq[String])
      : (DataFrame, Seq[String]) = {
    val payload = rightPayload.map(c => s"__r_$c")
    val l = left
      .withColumn("__t", col(leftTs))
      .withColumn("__side", lit(1))
    val lPadded = payload.foldLeft(l)((d, c) => d.withColumn(c, lit(null)))
    val r0 = right.select((key +: rightTs +: rightPayload).map(col): _*)
    val r = rightPayload.foldLeft(r0)((d, c) => d.withColumnRenamed(c, s"__r_$c"))
      .withColumn("__t", col(rightTs)).drop(rightTs)
      .withColumn("__side", lit(0))
    // Align schemas: right side lacks left's columns.
    val lCols = lPadded.columns.toSeq
    val rAligned = lCols.foldLeft(r)((d, c) =>
      if (r.columns.contains(c)) d else d.withColumn(c, lit(null)))
      .select(lCols.map(col): _*)
    (lPadded.unionByName(rAligned), payload)
  }

  /** Shared tail of the as-of joins: keep left rows, enforce inner
    * semantics (a match on the first payload column), rename `__r_*` →
    * `asof_*`.
    */
  private def asofFinish(filled: DataFrame, payload: Seq[String],
                         rightPayload: Seq[String],
                         keepUnmatched: Boolean = false): DataFrame = {
    val matched = filled.filter(col("__side") === 1).drop("__side")
    val inner =
      if (keepUnmatched) matched
      else payload.headOption.map(c => matched.filter(col(c).isNotNull))
        .getOrElse(matched)
    payload.zip(rightPayload).foldLeft(inner) { case (d, (tmp, orig)) =>
      d.withColumnRenamed(tmp, s"asof_$orig")
    }
  }

  /** LEFT OUTER as-of join (pandas merge_asof's default, DuckDB
    * `ASOF LEFT JOIN`): like [[asofJoin]] but left rows with no prior
    * right match survive with NULL payload — the form enrichment
    * pipelines want when "no state yet" is itself information. Same
    * single-shuffle union + per-key window mechanics.
    */
  def asofJoinLeft(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   rightPayload: Seq[String]): DataFrame = {
    val (unioned, payload) =
      asofUnion(left, right, key, leftTs, rightTs, rightPayload)
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(unioned)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    asofFinish(filled.drop("__t", "__side"), payload, rightPayload,
               keepUnmatched = true)
  }

  /** Hot-key-safe as-of join. [[asofJoin]]'s per-key window sorts each
    * key's FULL history in one task — fatal when one key owns 10⁹ rows
    * (one hot instrument in a 100 TB tick store; AQE never splits window
    * partitions). This variant additionally partitions the window by a
    * time bucket, so no task ever sorts more than one (key, bucket)
    * slice:
    *
    *  1. within-bucket pass — the same last(ignoreNulls) fill, windowed
    *     by (key, bucket);
    *  2. per-(key, bucket) reduction — the last right payload of each
    *     bucket (a hash aggregate, map-side combinable);
    *  3. carry pass — a window over the BUCKET LIST per key (rows =
    *     distinct buckets, bounded by timespan / bucketWidth, never by
    *     row count) propagates the latest earlier-bucket payload;
    *  4. rows with no within-bucket match coalesce to their bucket's
    *     carry.
    *
    * Answer-identical to [[asofJoin]]; `bucketOf` must be a
    * monotone-in-time bucket id (e.g. `floor(unix_micros(t) / width)`).
    */
  def asofJoinBucketed(left: DataFrame, right: DataFrame, key: String,
                       leftTs: String, rightTs: String,
                       rightPayload: Seq[String],
                       bucketOf: Column => Column): DataFrame = {
    val (unioned, payload) =
      asofUnion(left, right, key, leftTs, rightTs, rightPayload)
    val withB = unioned.withColumn("__b", bucketOf(col("__t")))
    val wIn = Window.partitionBy(col(key), col("__b"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(withB)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(wIn)))
    // last NON-NULL right payload per (key, bucket, column) — each
    // payload column independently, mirroring the single-window form's
    // per-column last(ignoreNulls) (a struct-level "last right row"
    // would carry a NULL field over an earlier non-null one). Aggregated
    // over ALL buckets present so left-only buckets still get carry.
    val lastCols = payload.map { c =>
      max_by(col(c), when(col(c).isNotNull,
                          struct(col("__t"), col("__side"))))
        .as(s"__bl_$c")
    }
    val bucketLast = withB.filter(col("__side") === 0)
      .groupBy(col(key), col("__b"))
      .agg(lastCols.head, lastCols.tail: _*)
    val allBuckets = withB.select(col(key), col("__b")).distinct()
    val wCarry = Window.partitionBy(key).orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry0 = allBuckets.join(bucketLast, Seq(key, "__b"), "left")
    val carry = payload.foldLeft(carry0)((d, c) =>
        d.withColumn(s"__cy_$c",
                     last(col(s"__bl_$c"), ignoreNulls = true).over(wCarry)))
      .select(col(key) +: col("__b") +:
                payload.map(c => col(s"__cy_$c")): _*)
    val joined = filled.join(carry, Seq(key, "__b"))
    val completed = payload.foldLeft(joined)((d, c) =>
      d.withColumn(c, coalesce(col(c), col(s"__cy_$c"))))
    asofFinish(
      completed.drop("__t" +: "__b" +: payload.map(c => s"__cy_$c"): _*),
      payload, rightPayload)
  }

  /** Top-k rows per group (SURVEY.md O3) — rank window + filter; partial
    * TakeOrdered happens per partition before the shuffle thanks to
    * window-in-SortExec, no global sort.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], order: Seq[Column],
                   k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Phase 1 of [[topKPerGroupSalted]]: scatter each group across `salts`
    * sub-partitions (salt = deterministic hash of `saltExpr`) and keep the
    * per-(group, salt) top-k. Any row in a group's GLOBAL top-k is also in
    * its salt slice's top-k under the same total order, so the survivor
    * set (≤ k·salts rows per group) is a superset of the final answer.
    * Package-private so the spec can assert the bound directly.
    */
  private[graft] def partialTopKPerSalt(df: DataFrame, groupCols: Seq[String],
                                        order: Seq[Column], k: Int,
                                        saltExpr: Column,
                                        salts: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(saltExpr, lit(salts)).cast("int"))
    val w = Window
      .partitionBy(groupCols.map(col) :+ col("__salt"): _*)
      .orderBy(order: _*)
    salted.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn", "__salt")
  }

  /** Hot-key-safe top-k per group. A plain per-group window
    * ([[topKPerGroup]]) sorts each group in ONE task — and AQE's skew
    * split only applies to shuffled sort-merge JOINS, not to window
    * partitions — so a power-law group column (one web domain with 10⁸
    * docs in a 100 TB corpus) funnels that whole group through a single
    * sort. Two phases fix the shape without changing the answer:
    * per-(group, salt) partial top-k first (the hot group fans out over
    * `salts` tasks, each bounded to k survivors), then the final window
    * over ≤ k·salts rows per group. `saltExpr` must be deterministic per
    * row (hash a key column, NOT rand()) so retries and oracle replays
    * see the same slicing.
    */
  def topKPerGroupSalted(df: DataFrame, groupCols: Seq[String],
                         order: Seq[Column], k: Int, saltExpr: Column,
                         salts: Int = 16): DataFrame =
    topKPerGroup(
      partialTopKPerSalt(df, groupCols, order, k, saltExpr, salts),
      groupCols, order, k)

  /** Global row_number WITHOUT the single-task window: an un-partitioned
    * `Window.orderBy` funnels every row through one task — fine at test
    * scale, fatal at 100 TB. This version range-partitions the sort, counts
    * rows per partition (one tiny job), and assigns rank = partition offset
    * + local index. Every stage is parallel; the only driver-side data is
    * one count per partition.
    *
    * Two known costs of the RDD drop (shared with [[globalPrefixSum]]):
    * the count pass and the rank pass re-evaluate the sorted lineage
    * (the exchange is reused through shuffle files; the within-partition
    * sort re-runs once), and downstream operators of the returned frame
    * sit outside whole-stage codegen. Both are per-plan constants, not
    * scale hazards — callers feeding DEEP downstream pipelines should
    * `localCheckpoint()` the result to cut both.
    */
  def globalRowNumber(df: DataFrame, order: Seq[Column],
                      rankCol: String = "rn"): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(
        spark.sessionState.conf.numShufflePartitions, order: _*)
      .sortWithinPartitions(order: _*)
    val rdd = sorted.rdd
    val counts = rdd.mapPartitionsWithIndex { (i, rows) =>
      Iterator.single((i, rows.size.toLong))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val withRank = rdd.mapPartitionsWithIndex { (i, rows) =>
      var r = bc.value(i)
      rows.map { row => r += 1; org.apache.spark.sql.Row.fromSeq(row.toSeq :+ r) }
    }
    spark.createDataFrame(withRank,
      sorted.schema.add(rankCol, org.apache.spark.sql.types.LongType,
                        nullable = false))
  }

  /** Fully IN-PLAN global row_number — the declarative sibling of
    * [[globalRowNumber]]: no RDD drop, no construction-time job, and
    * whole-stage codegen survives end to end, so the returned frame is
    * entirely self-contained (a bench times ALL of its work) and
    * composes into deeper pipelines.
    *
    * Mechanics, all inside one plan: a broadcast 1-row (min, max)
    * aggregate of the LEADING sort column splits its value range into
    * `buckets` (floor of a weakly-monotone IEEE map — equal values
    * land in one bucket, order across buckets is preserved; nulls take
    * bucket −1, matching ascending NULLS FIRST), per-bucket counts
    * cumulate into offsets via a window over the ≤ buckets+1
    * PRE-AGGREGATED rows (the machine-checkably-justified
    * single-partition shape), and rank = broadcast offset +
    * row_number within the bucket partition.
    *
    * The trade vs [[globalRowNumber]]: bucket boundaries come from the
    * value RANGE, not a sampled range partitioner — a heavily repeated
    * leading value concentrates its whole tie class in one window
    * partition. Use this form when the leading column is KNOWN
    * high-cardinality; use the RDD form (sampled split points) under
    * heavy leading-value skew; use [[globalRowNumberAuto]] to let an
    * exact per-bucket count probe pick for you.
    */
  def globalRowNumberInPlan(df: DataFrame, valueCol: Column,
                            order: Seq[Column], rankCol: String = "rn",
                            buckets: Int = 1024): DataFrame = {
    val bucketed = rangeBuckets(df, valueCol, buckets)
    val offsets = bucketOffsets(
      bucketed.groupBy("__bucket").agg(count(lit(1)).as("__n")))
    bucketed.join(broadcast(offsets), Seq("__bucket"))
      .withColumn(rankCol, col("__offset") +
        row_number().over(
          Window.partitionBy("__bucket").orderBy(order: _*)).cast("long"))
      .drop("__bucket", "__offset")
  }

  /** Fully IN-PLAN global running sum — [[globalRowNumberInPlan]]'s
    * bucketing applied to [[globalPrefixSum]]'s two-pass shape: bucket
    * offsets cumulate the per-bucket SUMS over the pre-aggregated
    * rows, the in-bucket remainder is a running-sum window inside the
    * bucket partition. Same trade as the rank form: value-range
    * boundaries vs sampled split points under leading-value skew.
    */
  def globalPrefixSumInPlan(df: DataFrame, valueCol: Column,
                            order: Seq[Column], sumCol: String,
                            outCol: String = "cumsum",
                            buckets: Int = 1024): DataFrame = {
    val bucketed = rangeBuckets(df, valueCol, buckets)
    val offsets = bucketOffsets(
      bucketed.groupBy("__bucket").agg(sum(sumCol).as("__n")))
    bucketed.join(broadcast(offsets), Seq("__bucket"))
      .withColumn(outCol, col("__offset") +
        sum(sumCol).over(
          Window.partitionBy("__bucket").orderBy(order: _*)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__bucket", "__offset")
  }

  /** The shared in-plan value-range bucketing: a broadcast 1-row
    * (min, max) aggregate of the leading sort column splits its range
    * into `buckets` via a weakly-monotone IEEE map (equal values share
    * a bucket, cross-bucket order is preserved); nulls take bucket −1,
    * matching ascending NULLS FIRST.
    */
  private def rangeBuckets(df: DataFrame, valueCol: Column,
                           buckets: Int): DataFrame = {
    val stats = df.agg(min(valueCol).cast("double").as("__lo"),
                       max(valueCol).cast("double").as("__hi"))
    df.crossJoin(broadcast(stats))
      // explicit null branch — least() SKIPS nulls, so a bare
      // least(cap, null-floor) would shove null values into the TOP
      // bucket instead of the leading one
      .withColumn("__bucket",
        when(valueCol.isNull, lit(-1L))
          .otherwise(least(lit((buckets - 1).toLong),
            floor((valueCol.cast("double") - col("__lo")) * buckets /
                  (col("__hi") - col("__lo") + 1.0d)))))
      .drop("__lo", "__hi")
  }

  /** Which implementation the skew dispatch picked — surfaced so specs
    * (and callers that want to log the decision) can assert the form.
    */
  private[graft] sealed trait RankForm
  private[graft] case object InPlanForm extends RankForm
  private[graft] case object SampledSplitForm extends RankForm

  /** The EXACT skew probe behind [[globalRowNumberAuto]] /
    * [[globalPrefixSumAuto]]: the share of rows landing in the heaviest
    * of [[rangeBuckets]]'s value-range buckets — i.e. exactly the
    * fraction of the corpus the in-plan form's largest window partition
    * would have to sort in ONE task. One aggregate pass (per-bucket
    * counts fold to a 1-row max/total), no sampling error: the same
    * measured-not-guessed discipline as the Jaccard Σdf² cost probe.
    */
  private[graft] def leadingBucketShare(df: DataFrame, valueCol: Column,
                                        buckets: Int): Double = {
    val r = rangeBuckets(df, valueCol, buckets)
      .groupBy("__bucket").agg(count(lit(1)).as("__n"))
      .agg(max("__n").cast("double").as("mx"),
           sum("__n").cast("double").as("tot")).head()
    if (r.isNullAt(0) || r.isNullAt(1) || r.getDouble(1) == 0d) 0d
    else r.getDouble(0) / r.getDouble(1)
  }

  /** Dispatch decision: in-plan value-range bucketing unless one bucket
    * would swallow more than `maxBucketShare` of the corpus.
    */
  private[graft] def rankFormFor(df: DataFrame, valueCol: Column,
                                 buckets: Int = 1024,
                                 maxBucketShare: Double = 0.2): RankForm =
    if (leadingBucketShare(df, valueCol, buckets) > maxBucketShare)
      SampledSplitForm
    else InPlanForm

  /** Skew-aware global row_number — auto-dispatch between
    * [[globalRowNumberInPlan]] (value-range buckets: no RDD drop,
    * codegen intact — the default) and [[globalRowNumber]] (sampled
    * split points: ties spread across partitions — the skew escape
    * hatch). The documented manual trade between the two becomes a
    * measured decision: [[leadingBucketShare]] computes the exact
    * fraction of rows the in-plan form's heaviest window partition
    * would funnel into one task, and past `maxBucketShare` (default
    * 20 % — far above any uniform distribution over 1024 buckets, far
    * below a pathological tie class) the sampled-split form takes
    * over. Both forms produce the identical total-order rank, so the
    * dispatch can never change the answer — only the plan shape. The
    * probe costs one counting pass; callers on a KNOWN
    * high-cardinality leading column can keep calling the in-plan
    * form directly.
    */
  def globalRowNumberAuto(df: DataFrame, valueCol: Column,
                          order: Seq[Column], rankCol: String = "rn",
                          buckets: Int = 1024,
                          maxBucketShare: Double = 0.2): DataFrame =
    rankFormFor(df, valueCol, buckets, maxBucketShare) match {
      case InPlanForm =>
        globalRowNumberInPlan(df, valueCol, order, rankCol, buckets)
      case SampledSplitForm => globalRowNumber(df, order, rankCol)
    }

  /** Skew-aware global running sum — [[globalRowNumberAuto]]'s dispatch
    * applied to the prefix-sum pair ([[globalPrefixSumInPlan]] vs
    * [[globalPrefixSum]]); same exact probe, same answer either way.
    */
  def globalPrefixSumAuto(df: DataFrame, valueCol: Column,
                          order: Seq[Column], sumCol: String,
                          outCol: String = "cumsum",
                          buckets: Int = 1024,
                          maxBucketShare: Double = 0.2): DataFrame =
    rankFormFor(df, valueCol, buckets, maxBucketShare) match {
      case InPlanForm =>
        globalPrefixSumInPlan(df, valueCol, order, sumCol, outCol, buckets)
      case SampledSplitForm => globalPrefixSum(df, order, sumCol, outCol)
    }

  /** Cumulative offsets over the ≤ buckets+1 PRE-AGGREGATED per-bucket
    * rows — the machine-checkably-justified single-partition window.
    */
  private def bucketOffsets(perBucket: DataFrame): DataFrame =
    perBucket
      .withColumn("__offset", coalesce(
        sum("__n").over(boundedWindow(col("__bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__bucket", "__offset")

  /** Global running sum WITHOUT the single-task window — same two-pass
    * mechanics as [[globalRowNumber]]: range-partition the sort, sum each
    * partition (one tiny job), then add the per-partition offset to a
    * local running sum. The driver only ever sees one long per partition.
    * Powers token-budget shard packing (`q_pack_shards`).
    */
  def globalPrefixSum(df: DataFrame, order: Seq[Column], valueCol: String,
                      outCol: String = "cumsum"): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(
        spark.sessionState.conf.numShufflePartitions, order: _*)
      .sortWithinPartitions(order: _*)
    val idx = sorted.schema.fieldIndex(valueCol)
    val rdd = sorted.rdd
    val sums = rdd.mapPartitionsWithIndex { (i, rows) =>
      var s = 0L
      rows.foreach(r => s += r.getLong(idx))
      Iterator.single((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = sums.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val withSum = rdd.mapPartitionsWithIndex { (i, rows) =>
      var s = bc.value(i)
      rows.map { row =>
        s += row.getLong(idx)
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ s)
      }
    }
    spark.createDataFrame(withSum,
      sorted.schema.add(outCol, org.apache.spark.sql.types.LongType,
                        nullable = false))
  }

  /** The scale path for interval/range joins: quantize the range into
    * buckets so the nested-loop join becomes a hash equi-join on the
    * bucket id (right intervals explode into every covered bucket, left
    * values land in one) + an exact residual filter. Turns the O(n·m)
    * BroadcastNestedLoopJoin into a shuffle join that scales to 100 TB —
    * the broadcast variant dies as soon as neither side fits in memory.
    */
  def bucketedBetweenJoin(left: DataFrame, leftVal: Column,
                          right: DataFrame, lo: Column, hi: Column,
                          width: Long): DataFrame = {
    val l = left.withColumn("__bucket",
                            floor(leftVal / width).cast("long"))
    val r = right.withColumn("__bucket",
      explode(sequence(floor(lo / width).cast("long"),
                       floor(hi / width).cast("long"))))
    l.join(r, "__bucket")
      .filter(leftVal.between(lo, hi))
      .drop("__bucket")
  }

  /** Salted equi-join for skewed keys: replicate the (smaller) right side
    * `saltFactor` times and scatter the left side's hot keys across the
    * replicas, so no single reducer owns a hot key's entire partition.
    * AQE's skew-join split covers sort-merge joins at runtime; explicit
    * salting is the plan-level tool when the skew is known up front (e.g.
    * a null-heavy or power-law foreign key at 100 TB).
    */
  /** Morton/Z-order value of two non-negative 32-bit dimensions: bits of
    * `a` spread to even positions, `b` to odd. Sorting or
    * range-partitioning by this interleaving clusters rows that are close
    * in BOTH dimensions into the same parquet files/row-groups, so
    * min/max skipping prunes 2-D box predicates — the multi-dimensional
    * clustering a single-column ORDER BY can't give (a linear (a, b) sort
    * scatters every a-slice across the full b range). All bit arithmetic;
    * fully codegen'd, no UDF.
    */
  def zorder2(a: Column, b: Column): Column = {
    // classic bit-spread via magic masks: x = x|x<<16 & 0x0000FFFF0000FFFF,
    // then 8/4/2/1 — each step doubles the gaps between occupied bits
    def spread(x: Column): Column = {
      val steps = Seq(
        (16, 0x0000FFFF0000FFFFL), (8, 0x00FF00FF00FF00FFL),
        (4, 0x0F0F0F0F0F0F0F0FL), (2, 0x3333333333333333L),
        (1, 0x5555555555555555L))
      steps.foldLeft(x.cast("long")) { case (acc, (s, m)) =>
        (acc.bitwiseOR(shiftleft(acc, s))).bitwiseAND(lit(m))
      }
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** Write `df` clustered on the Z-order of two dimensions: global range
    * partitioning by the interleaved value (so files own compact Z-ranges)
    * + an in-partition sort (so row-groups do too). `numFiles` tracks
    * total size / target file size at scale.
    */
  def writeZOrdered(df: DataFrame, a: Column, b: Column, numFiles: Int,
                    path: String): Unit =
    df.withColumn("__z", zorder2(a, b))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor))
        .cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Interval-overlap join (`a.start < b.end AND b.start < a.end`)
    * through bucket quantization — the two-sided sibling of
    * [[bucketedBetweenJoin]]: each interval explodes to the
    * `bucketWidth`-sized time buckets it touches (fan-out = interval
    * length / width, the caller-tuned knob), the sides meet on an
    * equi-join over the bucket id, and the exact predicate filters
    * residually. Overlapping intervals share every bucket in
    * `[max(firstA, firstB), min(lastA, lastB)]`; emitting only at
    * `bucket == max(firstA, firstB)` — each pair's FIRST shared bucket
    * — makes every pair appear exactly once with NO distinct/dedup
    * shuffle afterwards. Columns from both sides survive prefixed
    * `a_` / `b_`.
    */
  def intervalOverlapJoin(left: DataFrame, leftStart: Column,
                          leftEnd: Column, right: DataFrame,
                          rightStart: Column, rightEnd: Column,
                          bucketWidth: Long,
                          leftKey: Option[Column] = None,
                          rightKey: Option[Column] = None): DataFrame = {
    // evaluate the span against the caller's columns first, then
    // prefix-rename the payload
    val l = {
      val base = left.withColumn("a__s", leftStart.cast("long"))
        .withColumn("a__e", leftEnd.cast("long"))
        .withColumn("__k", leftKey.getOrElse(lit(0)))
      val renamed = left.columns.foldLeft(base)((d, c) =>
        d.withColumnRenamed(c, s"a_$c"))
      renamed.withColumn("__bk",
        explode(sequence(floor(col("a__s") / bucketWidth),
                         floor(col("a__e") / bucketWidth))))
    }
    val r = {
      val base = right.withColumn("b__s", rightStart.cast("long"))
        .withColumn("b__e", rightEnd.cast("long"))
        .withColumn("__k", rightKey.getOrElse(lit(0)))
      val renamed = right.columns.foldLeft(base)((d, c) =>
        d.withColumnRenamed(c, s"b_$c"))
      renamed.withColumn("__bk",
        explode(sequence(floor(col("b__s") / bucketWidth),
                         floor(col("b__e") / bucketWidth))))
    }
    l.join(r, Seq("__k", "__bk"))
      .filter(col("a__s") < col("b__e") && col("b__s") < col("a__e") &&
        col("__bk") === greatest(floor(col("a__s") / bucketWidth),
                                 floor(col("b__s") / bucketWidth)))
      .drop("__k", "__bk", "a__s", "a__e", "b__s", "b__e")
  }

  /** Spatial self-join: all point pairs within `radiusKm` great-circle
    * distance, grid-bucketed so the candidate space is collision-linear,
    * never all-pairs. Each point lands in a `cellDeg`-degree (lat, lon)
    * grid cell; the probe side replicates into its 3×3 neighborhood
    * (9 rows, a constant), the build side stays in its home cell, so
    * every qualifying pair meets on EXACTLY one (cell, cell) key — one
    * equi-join shuffle, exact haversine verification after. `id < id`
    * keeps each unordered pair once.
    *
    * `cellDeg` must span `radiusKm` of longitude at the highest |lat|
    * present (1° lon = 111.32·cos(lat) km — cells cover fewer km toward
    * the poles), or boundary pairs are silently missed; the require
    * enforces it for the caller-declared `maxAbsLat`.
    */
  def geoRadiusPairs(df: DataFrame, idCol: String, latCol: String,
                     lonCol: String, radiusKm: Double, cellDeg: Double,
                     maxAbsLat: Double = 85.0): DataFrame = {
    require(cellDeg * 111.32 *
              math.cos(math.toRadians(maxAbsLat)) >= radiusKm,
            s"cellDeg=$cellDeg too small for radius=$radiusKm km at " +
              s"|lat|<=$maxAbsLat")
    require(cellDeg * 110.57 >= radiusKm, // latitude span, poles included
            s"cellDeg=$cellDeg too small for radius=$radiusKm km of lat")
    val base = df.select(col(idCol).as("id"), col(latCol).as("lat"),
                         col(lonCol).as("lon"),
                         floor(col(latCol) / cellDeg).cast("long").as("cy"),
                         floor(col(lonCol) / cellDeg).cast("long").as("cx"))
    val probes = base
      .withColumn("__dy", explode(sequence(lit(-1), lit(1))))
      .withColumn("__dx", explode(sequence(lit(-1), lit(1))))
      .select(col("id").as("id_a"), col("lat").as("lat_a"),
              col("lon").as("lon_a"),
              (col("cy") + col("__dy")).as("cy"),
              (col("cx") + col("__dx")).as("cx"))
    val dist = Functions.haversineKm(col("lat_a"), col("lon_a"),
                                     col("lat"), col("lon"))
    probes.join(base, Seq("cy", "cx"))
      .filter(col("id_a") < col("id") && dist <= radiusKm)
      .select(col("id_a"), col("id").as("id_b"),
              round(dist, 4).as("dist_km"))
  }
}
