package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Destination-engine event analytics (SURVEY.md §2 [D]): the funnel /
  * retention / SCD-2 shapes ClickHouse deployments run over CDC event
  * history, as reusable DataFrame transforms.
  *
  * All three are shuffle-minimal: funnel chains per-entity aggregates
  * (each stage ≤1 row per entity before the next join), retention joins a
  * distinct (entity, day) activity set, SCD-2 is one entity-partitioned
  * window pass.
  */
object Analytics {

  /** Ordered-step funnel (ClickHouse windowFunnel analog): for each
    * entity, how many of `steps` completed in order, all within `window`
    * of the first step's first occurrence. Step k counts only if it
    * happens strictly after step k-1's qualifying time.
    * Returns (userCol, funnel_level).
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String], window: String): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val e = events.select(col(userCol).as("u"), col(typeCol).as("et"),
                          col(tsCol).as("ts"))
    val s1 = e.filter(col("et") === steps.head)
      .groupBy("u").agg(min("ts").as("t_prev"), min("ts").as("t0"))
    val stages = steps.tail.scanLeft(s1) { (prev, step) =>
      e.filter(col("et") === step).join(prev, "u")
        .filter(col("ts") > col("t_prev") &&
                col("ts") <= col("t0") + expr(s"INTERVAL $window"))
        .groupBy("u").agg(min("ts").as("t_prev"), min("t0").as("t0"))
    }
    val base = e.select(col("u")).distinct()
    stages.zipWithIndex.foldLeft(base) { case (acc, (st, i)) =>
      acc.join(st.select(col("u"), lit(1).as(s"l_$i")), Seq("u"), "left")
    }
      .select(col("u").as(userCol),
              stages.indices.map(i => coalesce(col(s"l_$i"), lit(0)))
                .reduce(_ + _).cast("long").as("funnel_level"))
  }

  /** Event-sequence predicate (ClickHouse `sequenceMatch('(?1).*(?2)…')`
    * analog): per entity, whether events matching each step occur in
    * STRICT time order, any gaps allowed. Greedy earliest-occurrence
    * chaining decides it exactly (if any ordered chain exists, the one
    * through each step's earliest admissible time does) — so the plan is
    * `steps` chained filter→min aggregates on the entity key, one
    * hash-shuffle shape, no per-entity sort or pattern automaton.
    * Returns (userCol, matched) for every entity in `events`.
    */
  def sequenceMatch(events: DataFrame, userCol: String, typeCol: String,
                    tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "sequenceMatch needs at least one step")
    val e = events.select(col(userCol).as("u"), col(typeCol).as("et"),
                          col(tsCol).as("ts"))
    val first = e.filter(col("et") === steps.head)
      .groupBy("u").agg(min("ts").as("t_prev"))
    val last = steps.tail.foldLeft(first) { (prev, step) =>
      e.filter(col("et") === step).join(prev, "u")
        .filter(col("ts") > col("t_prev"))
        .groupBy("u").agg(min("ts").as("t_prev"))
    }
    e.select(col("u")).distinct()
      .join(last.select(col("u"), lit(true).as("m")), Seq("u"), "left")
      .select(col("u").as(userCol),
              coalesce(col("m"), lit(false)).as("matched"))
  }

  /** ClickHouse `sequenceMatch('(?1)(?t<G)(?2)(?t<G)(?3)')` — the
    * time-CONDITIONED pattern match [[sequenceMatch]] can't express:
    * every consecutive matched pair must be under `maxGapSeconds`
    * apart, exists-subsequence semantics. Greedy earliest-first is
    * incomplete under gap bounds (an early step-1 can strand a later
    * viable chain), so this runs the latest-feasible-prefix DP
    * relationally: F₀ = step-0 events; Fᵢ = step-i events whose LATEST
    * strictly-earlier Fᵢ₋₁ end is within the gap — and "latest prior
    * within gap exists" ⟺ "ANY prior within gap exists", so keeping
    * every feasible end makes the DP exact. Each step is ONE strict
    * backward as-of join ([[Relational.asofJoin]] on micros shifted by
    * −1 µs), i.e. k−1 shuffles total, per-task state bounded by the
    * window machinery — no per-entity event buffer anywhere.
    */
  def sequenceMatchTime(events: DataFrame, userCol: String,
                        typeCol: String, tsCol: String,
                        steps: Seq[String],
                        maxGapSeconds: Long): DataFrame = {
    require(steps.nonEmpty, "sequenceMatchTime needs at least one step")
    val gapMicros = maxGapSeconds * 1000000L
    val e = events.select(col(userCol).as("u"), col(typeCol).as("et"),
                          col(tsCol).as("ts"))
    val first = e.filter(col("et") === steps.head)
      .select(col("u"), col("ts"))
    val lastF = steps.tail.foldLeft(first) { (prev, step) =>
      val li = e.filter(col("et") === step)
        .select(col("u"), col("ts"),
                (unix_micros(col("ts")) - 1).as("__tq"))
      val ri = prev.select(col("u"),
                           unix_micros(col("ts")).as("__tr"),
                           unix_micros(col("ts")).as("__fp"))
      Relational.asofJoin(li, ri, "u", "__tq", "__tr", Seq("__fp"))
        // asof picked f = max {f : f <= ts - 1µs}; the (?t<G) bound
        // is strict: ts - f < G
        .filter(col("asof___fp").isNotNull &&
                col("__tq") + 1 - col("asof___fp") < gapMicros)
        .select(col("u"), col("ts"))
    }
    e.select(col("u")).distinct()
      .join(lastF.select(col("u")).distinct()
              .withColumn("m", lit(true)),
            Seq("u"), "left")
      .select(col("u").as(userCol),
              coalesce(col("m"), lit(false)).as("matched"))
  }

  /** ClickHouse `sequenceCount('(?1).*(?2)…')` analog: per entity, how
    * many NON-OVERLAPPING ordered occurrences of the step pattern exist
    * (gaps allowed). Greedy left-to-right matching is optimal for
    * non-overlapping counting, and greedy matching is an integer fold
    * over the entity's time-ordered event types: the accumulator counts
    * total matched steps (acc / n = completed sequences, acc % n = the
    * step the automaton is waiting for).
    *
    * Delegates to [[sequenceCountBucketed]] with day buckets so no
    * aggregation buffer ever holds more than one (entity, day) slice —
    * a bot entity with 10⁸ events no longer funnels its whole history
    * into a single buffer.
    */
  def sequenceCount(events: DataFrame, userCol: String, typeCol: String,
                    tsCol: String, orderCol: String,
                    steps: Seq[String]): DataFrame =
    sequenceCountBucketed(events, userCol, typeCol, tsCol, orderCol, steps,
                          t => date_trunc("day", t))

  /** Phase 1 of [[sequenceCountBucketed]]: per (entity, bucket), run the
    * greedy automaton once for EVERY possible entry phase s ∈ [0, n) in a
    * single pass (the accumulator is an n-track int array; track s starts
    * at s, each event advances the tracks whose awaited step it matches).
    * The automaton's transition depends only on `acc % n`, so these n
    * exit values are a complete summary of the bucket: composing entry
    * state `acc` across buckets is `acc - (acc % n) + track[acc % n]`.
    * Package-private so the spec can assert the per-bucket buffer bound.
    */
  private[graft] def sequenceCountBucketSummaries(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      orderCol: String, steps: Seq[String],
      bucketOf: Column => Column): DataFrame = {
    val n = steps.size
    val stepArr = array(steps.map(lit): _*)
    events
      .groupBy(col(userCol), bucketOf(col(tsCol)).as("__b"))
      .agg(transform(
        array_sort(collect_list(struct(col(tsCol), col(orderCol),
                                       col(typeCol).as("et")))),
        e => e.getField("et")).as("evs"))
      .select(col(userCol), col("__b"), size(col("evs")).as("__n"),
              aggregate(col("evs"), sequence(lit(0), lit(n - 1)),
                (tracks, t) => transform(tracks,
                  a => when(t === element_at(stepArr, pmod(a, lit(n)) + 1),
                            a + 1).otherwise(a))).as("__tracks"))
  }

  /** Hot-entity-safe [[sequenceCount]]: the single-buffer form collects an
    * entity's ENTIRE sorted history into one aggregation buffer before the
    * fold — unbounded in entity size. This variant is the three-pass
    * [[Relational.asofJoinBucketed]] shape: per (entity, time-bucket)
    * automaton summaries first (buffer = one bucket's slice), then a
    * carry fold over the BUCKET SUMMARIES per entity (rows per key
    * bounded by timespan / bucketWidth, never by event count). Integer
    * arithmetic throughout, so the composed count is bit-identical to the
    * straight fold.
    */
  def sequenceCountBucketed(events: DataFrame, userCol: String,
                            typeCol: String, tsCol: String, orderCol: String,
                            steps: Seq[String],
                            bucketOf: Column => Column): DataFrame = {
    require(steps.nonEmpty, "sequenceCount needs at least one step")
    val n = steps.size
    sequenceCountBucketSummaries(events, userCol, typeCol, tsCol, orderCol,
                                 steps, bucketOf)
      .groupBy(col(userCol))
      .agg(transform(
        sort_array(collect_list(struct(col("__b"), col("__tracks")))),
        b => b.getField("__tracks")).as("bs"))
      .select(col(userCol),
              (aggregate(col("bs"), lit(0),
                 (acc, tr) => acc - pmod(acc, lit(n))
                   + element_at(tr, pmod(acc, lit(n)) + 1)) / n)
                .cast("long").as("n_matches"))
  }

  /** Phase 1 of [[emaBucketed]]: per (entity, time-bucket), the bucket's
    * sorted slice folds to a complete EMA summary. EMA with factor α is
    * affine in the incoming accumulator: folding values v₁…vₙ onto entry
    * state a yields `a·(1-α)ⁿ + Σ α·vᵢ·(1-α)ⁿ⁻ⁱ`, so each bucket reduces
    * to `__d = (1-α)ⁿ` (decay) and `__p` (the zero-seeded left-to-right
    * fold). `__ps` is the SEEDED fold (acc₀ = the bucket's first value,
    * ClickHouse's seeding rule) — used only for an entity's first bucket,
    * so single-bucket entities reproduce the straight recursion's exact
    * operation order. Package-private so the spec can assert the
    * per-bucket buffer bound.
    */
  private[graft] def emaBucketSummaries(events: DataFrame, keyCol: String,
                                        tsCol: String, tieCol: String,
                                        valCol: String, alpha: Double,
                                        bucketOf: Column => Column)
      : DataFrame = {
    val h = sort_array(collect_list(struct(col(tsCol), col(tieCol),
                                           col(valCol).as("v"))))
    val fold = (zero: Column, over: Column) =>
      aggregate(over, zero,
        (acc, x) => lit(alpha) * x.getField("v") + lit(1 - alpha) * acc)
    events
      .groupBy(col(keyCol), bucketOf(col(tsCol)).as("__b"))
      .agg(h.as("h"))
      .select(col(keyCol), col("__b"), size(col("h")).as("__n"),
              pow(lit(1 - alpha), size(col("h"))).as("__d"),
              fold(lit(0.0), col("h")).as("__p"),
              fold(element_at(col("h"), 1).getField("v"),
                   slice(col("h"), lit(2),
                         greatest(size(col("h")) - 1, lit(0)))).as("__ps"))
  }

  /** Hot-entity-safe per-series EMA (ClickHouse exponentialMovingAverage
    * analog, final value per entity). The single-buffer form collects an
    * entity's ENTIRE sorted history into one aggregation buffer — a bot
    * entity with 10⁸ events puts 10⁸ structs in one buffer. This is the
    * three-pass [[Relational.asofJoinBucketed]] shape instead: per
    * (entity, time-bucket) affine summaries `(decay, partial)` first
    * (buffer = one bucket's slice), then a carry fold over the BUCKET
    * SUMMARIES per entity — rows per key bounded by timespan /
    * bucketWidth, never by event count: `acc → acc·__d + __p`, seeded
    * with the first bucket's `__ps`. Returns (keyCol, ema).
    */
  def emaBucketed(events: DataFrame, keyCol: String, tsCol: String,
                  tieCol: String, valCol: String, alpha: Double,
                  bucketOf: Column => Column): DataFrame =
    emaBucketSummaries(events, keyCol, tsCol, tieCol, valCol, alpha, bucketOf)
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("__b"), col("__d"), col("__p"),
                                          col("__ps")))).as("bs"))
      .select(col(keyCol),
              aggregate(
                slice(col("bs"), lit(2),
                      greatest(size(col("bs")) - 1, lit(0))),
                element_at(col("bs"), 1).getField("__ps"),
                (acc, b) => acc * b.getField("__d") + b.getField("__p"))
                .as("ema"))

  /** Time-weighted exponential decay average (ClickHouse
    * `exponentialTimeDecayedAvg` analog, final value per entity) — the
    * irregular-series form: each observation is weighted by how long ago
    * it happened, `0.5^(age / halfLife)`, NOT by how many rows follow it,
    * so a burst of 1000 events in one second doesn't drown the history
    * the way row-weighted EMA does. Age is quantized to whole half-lives
    * (`halfLifeSec` seconds), which keeps every
    * weight an exact power of two in IEEE doubles — deterministic across
    * engines, so the oracle can replicate it bit-for-bit.
    *
    * Unlike row-weighted EMA this is NOT recursive — it is a plain
    * weighted mean anchored at the entity's latest timestamp — so the
    * plan needs no history buffer at all: one aggregate for the anchor,
    * a co-partitioned self-join, and a map-side-combinable weighted-sum
    * aggregate. Already hot-entity-safe. Returns (keyCol, tdavg).
    */
  def timeDecayedAvg(events: DataFrame, keyCol: String, tsCol: String,
                     valCol: String, halfLifeSec: Long): DataFrame = {
    val anchors = events.groupBy(col(keyCol))
      .agg(max(unix_timestamp(col(tsCol))).as("__t_last"))
    val w = pow(lit(0.5),
                floor((col("__t_last") - unix_timestamp(col(tsCol)))
                        / halfLifeSec).cast("double"))
    events.join(anchors, keyCol)
      .groupBy(col(keyCol))
      .agg((sum(col(valCol) * w) / sum(w)).as("tdavg"))
  }

  /** The rest of the ClickHouse `exponentialTimeDecayed*` family in one
    * pass — Sum (Σ vᵢ·wᵢ), Count (Σ wᵢ: the decayed event count), and
    * Max (max vᵢ·wᵢ) share [[timeDecayedAvg]]'s anchor-and-weight plan:
    * weights `0.5^floor(age/halfLife)` are exact powers of two anchored
    * at each entity's latest event, so every product is a bit-portable
    * IEEE double and a SQL oracle matches exactly. Two co-partitioned
    * aggregates, no history buffer.
    */
  def timeDecayedStats(events: DataFrame, keyCol: String, tsCol: String,
                       valCol: String, halfLifeSec: Long): DataFrame = {
    val anchors = events.groupBy(col(keyCol))
      .agg(max(unix_timestamp(col(tsCol))).as("__t_last"))
    val w = pow(lit(0.5),
                floor((col("__t_last") - unix_timestamp(col(tsCol)))
                        / halfLifeSec).cast("double"))
    events.join(anchors, keyCol)
      .groupBy(col(keyCol))
      .agg(sum(col(valCol) * w).as("tdsum"),
           sum(w).as("tdcount"),
           max(col(valCol) * w).as("tdmax"))
  }

  /** Linear-interpolation gap fill (ClickHouse `WITH FILL …
    * INTERPOLATE` analog, time-weighted): one row per (entity, day)
    * over the entity's active range; each day's end-of-day value is the
    * time-weighted blend of the surrounding observations, edge days
    * carry the nearest one. `obs` must hold ONE row per (entity, ts) —
    * version-dedup first. The grid and the observations union into ONE
    * per-entity window pass: a single hash shuffle on the key, two
    * frames (running-last backward, running-first forward) over the
    * same sort — no join at all. Returns (userCol, d, interp_value).
    */
  def interpolateDaily(obs: DataFrame, userCol: String, tsCol: String,
                       valCol: String): DataFrame = {
    val u = col(userCol)
    val grid = obs.groupBy(userCol)
      .agg(date_trunc("day", min(tsCol)).as("d_min"),
           date_trunc("day", max(tsCol)).as("d_max"))
      .select(u, explode(sequence(col("d_min"), col("d_max"),
                                  expr("INTERVAL 1 DAY"))).as("d"))
      .withColumn("__t", col("d") + expr("INTERVAL 1 DAY")
                           - expr("INTERVAL 1 MICROSECOND"))
      .withColumn("__isg", lit(1))
      .withColumn("__v", lit(null).cast("double"))
    val o = obs.select(u, col(tsCol).as("__t"), col(valCol).as("__v"))
      .withColumn("d", lit(null).cast("timestamp"))
      .withColumn("__isg", lit(0))
    val cols = Seq(userCol, "d", "__t", "__isg", "__v").map(col)
    // observations sort BEFORE a grid point at the same instant, so a
    // simultaneous observation lands in the backward frame exactly once
    val wB = Window.partitionBy(userCol).orderBy(col("__t"), col("__isg"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(userCol).orderBy(col("__t"), col("__isg"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsT = when(col("__v").isNotNull, col("__t"))
    grid.select(cols: _*).unionByName(o.select(cols: _*))
      .withColumn("pv", last(col("__v"), ignoreNulls = true).over(wB))
      .withColumn("pt", last(obsT, ignoreNulls = true).over(wB))
      .withColumn("nv", first(col("__v"), ignoreNulls = true).over(wF))
      .withColumn("nt", first(obsT, ignoreNulls = true).over(wF))
      .filter(col("__isg") === 1)
      .select(u, col("d"),
              when(col("pv").isNull, col("nv"))
                .when(col("nv").isNull, col("pv"))
                .otherwise(col("pv") + (col("nv") - col("pv")) *
                  ((unix_micros(col("__t")) - unix_micros(col("pt"))) /
                   (unix_micros(col("nt")) - unix_micros(col("pt")))
                     .cast("double")))
                .as("interp_value"))
  }

  /** Cohort retention (ClickHouse retention analog): entities grouped by
    * the day of their first `cohortType` event; for each offset n in
    * `days`, how many were active exactly n days later. Returns
    * (d0, n_users, retained_d<n>...).
    */
  def retention(events: DataFrame, userCol: String, typeCol: String,
                tsCol: String, cohortType: String,
                days: Seq[Int]): DataFrame = {
    require(days.nonEmpty, "retention needs at least one day offset")
    val cohort = events.filter(col(typeCol) === cohortType)
      .groupBy(userCol).agg(date_trunc("day", min(tsCol)).as("d0"))
    val activity = events
      .select(col(userCol), date_trunc("day", col(tsCol)).as("d"))
      .distinct()
    val flags = days.map { n =>
      max(when(col("d") === col("d0") + expr(s"INTERVAL $n DAYS"), 1)
            .otherwise(0)).as(s"r_$n")
    }
    val sums: Seq[Column] = days.map { n =>
      sum(s"r_$n").cast("long").as(s"retained_d$n")
    }
    cohort.join(activity, userCol)
      .groupBy(col(userCol), col("d0"))
      .agg(flags.head, flags.tail: _*)
      .groupBy("d0")
      .agg(count(lit(1)).as("n_users"), sums: _*)
  }

  /** SCD Type-2 validity intervals: every change row becomes valid from
    * its timestamp until the entity's next change (null = current state).
    * `tieCols` break ordering ties deterministically.
    */
  def scd2(df: DataFrame, keyCol: String, tsCol: String,
           tieCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol) +: tieCols: _*)
    df.withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
  }

  /** Mann–Whitney U statistic (ClickHouse mannWhitneyUTest, statistic
    * only) comparing `valueCol` between rows where `groupCol == label1`
    * and the rest. Tie-averaged rank sums WITHOUT a single-task global
    * window: [[Relational.globalRowNumber]] range-partitions the sort,
    * then one hash aggregate per distinct value recovers the
    * tie-averaged rank (the mean of the consecutive raw row numbers a
    * tie run receives — independent of how the run was ordered) plus the
    * per-sample counts. U₁ = R₁ − n₁(n₁+1)/2, U₂ = n₁n₂ − U₁. Returns
    * one row (u1, u2, n1, n2).
    */
  def mannWhitneyU(df: DataFrame, valueCol: String, groupCol: String,
                   label1: String): DataFrame =
    Relational.globalRowNumber(
        df.select(col(valueCol).as("__v"), col(groupCol).as("__g"))
          .filter(col("__v").isNotNull),
        Seq(col("__v")), "__rn")
      .groupBy("__v")
      .agg(avg("__rn").as("ar"),
           count(when(col("__g") === label1, lit(1)))
             .cast("double").as("c1"),
           count(lit(1)).cast("double").as("c"))
      .agg(sum(col("ar") * col("c1")).as("r1"),
           sum("c1").as("n1"), sum("c").as("n"))
      .select(
        (col("r1") - col("n1") * (col("n1") + 1) / 2).as("u1"),
        (col("n1") * (col("n") - col("n1")) -
           (col("r1") - col("n1") * (col("n1") + 1) / 2)).as("u2"),
        col("n1").cast("long").as("n1"),
        (col("n") - col("n1")).cast("long").as("n2"))

  /** Union length of per-entity intervals (ClickHouse `intervalLengthSum`
    * analog) plus the merged-interval count: classic gaps-and-islands in
    * ONE per-key window pass — the running max of interval ends over
    * strictly earlier rows marks where a new island starts, a running sum
    * of those marks numbers the islands, and two hash aggregates reduce
    * islands to (union_len, n_islands). One shuffle on the key; no
    * self-join, no explode, cost independent of overlap fan-out.
    * `startCol`/`endCol` are numeric (e.g. epoch seconds); abutting
    * intervals [a,b],[b,c] merge (`start > prevMax` is false at b).
    */
  def intervalUnionLength(df: DataFrame, keyCol: String, startCol: String,
                          endCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    df.withColumn("__new",
        when(prevMax.isNull || col(startCol) > prevMax, 1).otherwise(0))
      .withColumn("__isl",
        sum(col("__new"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("__isl"))
      .agg((max(col(endCol)) - min(col(startCol))).as("__len"))
      .groupBy(col(keyCol))
      .agg(sum("__len").cast("long").as("union_len"),
           count(lit(1)).cast("long").as("n_islands"))
  }

  /** Maximum number of simultaneously-open intervals per entity, and the
    * earliest instant that maximum is reached (ClickHouse
    * `maxIntersections` / `maxIntersectionsPosition`): every interval
    * contributes +1 at its start and −1 at its end, one per-key window
    * sweeps the boundary points in time order (ends sort BEFORE starts at
    * the same instant — half-open [s, e) semantics, so abutting intervals
    * never overlap), and the answer is the running sum's max plus the
    * minimum time attaining it. Two window frames over the SAME sort (the
    * running sum, then the per-key max) — one shuffle on the key total.
    */
  def maxConcurrentIntervals(df: DataFrame, keyCol: String,
                             startCol: String, endCol: String): DataFrame = {
    val pts = df
      .select(col(keyCol), col(startCol).as("__t"), lit(1).as("__d"))
      .unionByName(
        df.select(col(keyCol), col(endCol).as("__t"), lit(-1).as("__d")))
    val wRun = Window.partitionBy(keyCol).orderBy(col("__t"), col("__d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts.withColumn("__run", sum(col("__d")).over(wRun))
      .withColumn("__mx", max(col("__run")).over(Window.partitionBy(keyCol)))
      .filter(col("__run") === col("__mx"))
      .groupBy(col(keyCol))
      .agg(max("__mx").cast("long").as("max_concurrent"),
           min("__t").cast("long").as("at_t"))
  }

  /** Spearman rank correlation (ClickHouse `rankCorr`), ties averaged —
    * one row (rank_corr, n). No per-group ranking window anywhere: each
    * variable is ranked by [[Relational.globalRowNumber]] (range-
    * partitioned sort, never a single-task window), tie runs collapse to
    * their mean row number by a hash aggregate (the mean of a run of
    * consecutive integers is order-independent), and the data joins the
    * two tiny (distinct-value → rank) tables back by value. Tie-averaged
    * ranks are integer multiples of 1/2, so DOUBLED ranks are exact
    * integers: the five Pearson moment sums run in DECIMAL(38,0) — exact
    * — and the statistic is one deterministic double expression at the
    * end, so a SQL oracle reproduces it bit-for-bit.
    */
  def rankCorr(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    def rank2(c: String): DataFrame =
      Relational.globalRowNumber(
          df.select(col(c).as("__v")).filter(col("__v").isNotNull),
          Seq(col("__v")), "__rn")
        .groupBy("__v")
        .agg((avg("__rn") * 2).cast("decimal(38,0)").as("__r2"))
    val rx = rank2(xCol).withColumnsRenamed(Map("__v" -> xCol,
                                                "__r2" -> "__rx"))
    val ry = rank2(yCol).withColumnsRenamed(Map("__v" -> yCol,
                                                "__r2" -> "__ry"))
    df.select(col(xCol), col(yCol))
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .join(rx, xCol).join(ry, yCol)
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
           sum("__rx").as("sx"), sum("__ry").as("sy"),
           sum(col("__rx") * col("__ry")).as("sxy"),
           sum(col("__rx") * col("__rx")).as("sxx"),
           sum(col("__ry") * col("__ry")).as("syy"))
      .select(
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
           (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
                   .cast("double")) *
            sqrt((col("n") * col("syy") - col("sy") * col("sy"))
                   .cast("double")))).as("rank_corr"),
        col("n").cast("long").as("n"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic (ClickHouse
    * `kolmogorovSmirnovTest`, statistic only): D = max over x of
    * |F₁(x) − F₂(x)| between `valueCol` under `groupCol == label1` vs
    * `label2`. The empirical CDFs need cumulative counts over the sorted
    * value domain — done on the per-DISTINCT-VALUE count table via two
    * [[Relational.globalPrefixSum]] passes (range-partitioned, never a
    * single-task window), so the sort touches one row per distinct value,
    * not per observation. The max runs over the INTEGER cross-difference
    * |c₁·n₂ − c₂·n₁| (exact, order-independent); only the final division
    * is floating point. Returns one row (ks_d, n1, n2).
    */
  def ksTest(df: DataFrame, valueCol: String, groupCol: String,
             label1: String, label2: String): DataFrame = {
    val g = df
      .filter(col(groupCol).isin(label1, label2) &&
                col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("__v"))
      .agg(count(when(col(groupCol) === label1, lit(1))).as("__a"),
           count(when(col(groupCol) === label2, lit(1))).as("__b"))
    val cum = Relational.globalPrefixSum(
      Relational.globalPrefixSum(g, Seq(col("__v")), "__a", "__ca"),
      Seq(col("__v")), "__b", "__cb")
    // totals = the last cumulative row's values; one-row broadcast join
    val tot = cum.agg(max("__ca").as("__n1"), max("__cb").as("__n2"))
    cum.join(broadcast(tot))
      .agg(max(abs(col("__ca") * col("__n2") - col("__cb") * col("__n1")))
             .as("__dmax"),
           max("__ca").as("__n1"), max("__cb").as("__n2"))
      .select(
        (col("__dmax").cast("double") /
           (col("__n1").cast("double") * col("__n2"))).as("ks_d"),
        col("__n1").cast("long").as("n1"),
        col("__n2").cast("long").as("n2"))
  }

  /** Largest-Triangle-Three-Buckets downsampling per series (ClickHouse
    * `largestTriangleThreeBuckets`), in the PARALLEL bucket-anchor
    * variant: classic LTTB anchors each bucket's triangle on the
    * previously SELECTED point (a sequential chain); anchoring on the
    * neighboring non-empty buckets' MEAN points instead makes every
    * bucket independent — three shuffles total (per-key span, per-bucket
    * sums, per-bucket argmax), no iteration, no per-key sequential scan.
    * The first/last bucket keep the series' first/last point exactly,
    * as LTTB does. Ties (equal area) break to the earlier point.
    *
    * Determinism note: bucket sums are double accumulations — exact (so
    * safe to hash-compare cross-engine) when `tCol`/`vCol` are
    * integer-valued with per-bucket sums below 2⁵³; the area itself is
    * then a fixed IEEE expression over identical operands. Feed epoch
    * SECONDS and scaled-integer values for oracle-checkable output.
    *
    * Returns (keyCol, bucket, t, v) — at most `nBuckets` rows per key.
    */
  def lttbDownsample(df: DataFrame, keyCol: String, tCol: String,
                     vCol: String, nBuckets: Int): DataFrame = {
    require(nBuckets >= 3, "lttbDownsample needs at least 3 buckets")
    val span = df.groupBy(keyCol)
      .agg(min(tCol).as("__tmin"), max(tCol).as("__tmax"))
    val pts = df.join(span, keyCol)
      .withColumn("__rt", (col(tCol) - col("__tmin")).cast("double"))
      .withColumn("__v", col(vCol).cast("double"))
      .withColumn("__b", least(lit(nBuckets - 1),
        floor(col("__rt") * nBuckets /
                (col("__tmax") - col("__tmin") + 1).cast("double"))
          .cast("int")))
    val sums = pts.groupBy(col(keyCol), col("__b"))
      .agg(sum("__rt").as("__st"), sum("__v").as("__sv"),
           count(lit(1)).cast("double").as("__n"))
    val wb = Window.partitionBy(keyCol).orderBy("__b")
    // neighbor = adjacent NON-EMPTY bucket (empty buckets are skipped by
    // construction — they have no summary row)
    val nbr = sums.select(col(keyCol), col("__b"),
      (lag("__st", 1).over(wb) / lag("__n", 1).over(wb)).as("__pt"),
      (lag("__sv", 1).over(wb) / lag("__n", 1).over(wb)).as("__pv"),
      (lead("__st", 1).over(wb) / lead("__n", 1).over(wb)).as("__nt"),
      (lead("__sv", 1).over(wb) / lead("__n", 1).over(wb)).as("__nv"))
    val joined = pts.join(nbr, Seq(keyCol, "__b"))
    val isFirst = col("__pt").isNull
    val isLast = col("__nt").isNull
    val area = abs((col("__pt") - col("__nt")) * (col("__v") - col("__pv"))
                     - (col("__pt") - col("__rt")) *
                       (col("__nv") - col("__pv")))
    // lexicographic selection key: middle buckets maximize area then
    // prefer the earlier/smaller point; the first bucket takes the
    // series' first point (min t), the last bucket its last (max t)
    val sel = struct(
      when(isFirst || isLast, lit(0.0)).otherwise(area),
      when(isLast, col("__rt")).otherwise(-col("__rt")),
      when(isLast, col("__v")).otherwise(-col("__v")))
    joined.groupBy(col(keyCol), col("__b").as("bucket"))
      .agg(max_by(struct(col(tCol).as("t"), col(vCol).as("v")), sel)
             .as("__sel"))
      .select(col(keyCol), col("bucket").cast("long").as("bucket"),
              col("__sel.t").as("t"), col("__sel.v").as("v"))
  }

  /** [[funnelSliding]] in ClickHouse `windowFunnel`'s 'strict_order'
    * mode: a chain advances only when the expected step is the
    * entity's IMMEDIATELY NEXT event — any intervening event kills
    * that chain (later chain starts still restart it). Because the
    * next event is unique, greedy matching is trivially exact: each
    * stage is ONE strict forward as-of join to the per-instant-reduced
    * event stream (min_by(event_id) decides simultaneous events — the
    * deterministic contract) followed by a type check. Same linear
    * cost and return shape as [[funnelSliding]].
    */
  def funnelStrictOrder(events: DataFrame, userCol: String,
                        typeCol: String, tsCol: String, idCol: String,
                        steps: Seq[String], window: String): DataFrame = {
    require(steps.nonEmpty, "funnelStrictOrder needs at least one step")
    val e = events.select(col(userCol).as("u"), col(typeCol).as("et"),
                          col(tsCol).as("ts"), col(idCol).as("eid"))
    val nxt = e.groupBy(col("u"), col("ts"))
      .agg(min_by(col("et"), col("eid")).as("nt"))
      .withColumn("tn", col("ts"))
    val s1 = e.filter(col("et") === steps.head)
      .select(col("u"), col("ts").as("t0"), col("ts").as("t_prev"))
    val stages = steps.tail.scanLeft(s1) { (prev, step) =>
      Relational.asofJoinForward(prev, nxt, "u", "t_prev", "ts",
                                 Seq("nt", "tn"), strict = true)
        .filter(col("asof_nt") === step &&
                  col("asof_tn") <= col("t0") + expr(s"INTERVAL $window"))
        .select(col("u"), col("t0"), col("asof_tn").as("t_prev"))
    }
    val base = e.select(col("u")).distinct()
    stages.zipWithIndex.foldLeft(base) { case (acc, (st, i)) =>
      acc.join(st.select(col("u")).distinct()
                 .withColumn(s"l_$i", lit(1)),
               Seq("u"), "left")
    }
      .select(col("u").as(userCol),
              stages.indices.map(i => coalesce(col(s"l_$i"), lit(0)))
                .reduce(_ + _).cast("long").as("funnel_level"))
  }

  /** [[funnelSliding]] in ClickHouse `windowFunnel`'s 'strict_dedup'
    * mode: after steps 1..k have matched, a REPEAT of any already-matched
    * condition arriving before step k+1 interrupts the chain. Greedy
    * earliest-next is still exact, and the dedup check folds INTO the
    * as-of lookup: per stage the candidate stream is the union of the
    * already-matched types and the expected next type — if the earliest
    * such event is the expected type the chain advances, otherwise a
    * repeat got there first and the chain dies. One strict forward as-of
    * join per stage against a per-instant-reduced (min_by event id)
    * stream, so simultaneous events decide deterministically; linear in
    * events like the other modes.
    */
  def funnelStrictDedup(events: DataFrame, userCol: String,
                        typeCol: String, tsCol: String, idCol: String,
                        steps: Seq[String], window: String): DataFrame = {
    require(steps.nonEmpty, "funnelStrictDedup needs at least one step")
    val e = events.select(col(userCol).as("u"), col(typeCol).as("et"),
                          col(tsCol).as("ts"), col(idCol).as("eid"))
    val s1 = e.filter(col("et") === steps.head)
      .select(col("u"), col("ts").as("t0"), col("ts").as("t_prev"))
    val stages = steps.tail.zipWithIndex.scanLeft(s1) {
      case (prev, (step, i)) =>
        val relevant = steps.take(i + 1) :+ step
        val nxt = e.filter(col("et").isin(relevant: _*))
          .groupBy(col("u"), col("ts"))
          .agg(min_by(col("et"), col("eid")).as("nt"))
          .withColumn("tn", col("ts"))
        Relational.asofJoinForward(prev, nxt, "u", "t_prev", "ts",
                                   Seq("nt", "tn"), strict = true)
          .filter(col("asof_nt") === step &&
                    col("asof_tn") <= col("t0") + expr(s"INTERVAL $window"))
          .select(col("u"), col("t0"), col("asof_tn").as("t_prev"))
    }
    val base = e.select(col("u")).distinct()
    stages.zipWithIndex.foldLeft(base) { case (acc, (st, i)) =>
      acc.join(st.select(col("u")).distinct()
                 .withColumn(s"l_$i", lit(1)),
               Seq("u"), "left")
    }
      .select(col("u").as(userCol),
              stages.indices.map(i => coalesce(col(s"l_$i"), lit(0)))
                .reduce(_ + _).cast("long").as("funnel_level"))
  }

  /** Theil's uncertainty coefficient U(x|y) (ClickHouse `theilsU`) and
    * the Pearson contingency coefficient between two categoricals — the
    * same contingency-cell shapes as the `q_agg_cramers_v` plan: one
    * hash aggregate to cells, tiny marginal aggregates broadcast back,
    * then exact-count entropies with NO second marginal join:
    * H(x) = ln N − (Σ_x rt·ln rt)/N where Σ_x rt·ln rt = Σ_cells o·ln rt,
    * H(x|y) = (Σ_cells o·ln(ct/o))/N, U = (H(x) − H(x|y))/H(x);
    * C = sqrt(χ²/(N+χ²)) collapses to sqrt(1 − 1/q) with
    * q = Σ o²/(rt·ct) (N cancels). Returns one row
    * (theils_u, contingency_c, n).
    */
  def contingencyStats(df: DataFrame, xCol: String,
                       yCol: String): DataFrame = {
    val cells = df.groupBy(xCol, yCol)
      .agg(count(lit(1)).cast("double").as("obs"))
    val rowTot = cells.groupBy(xCol).agg(sum("obs").as("rt"))
    val colTot = cells.groupBy(yCol).agg(sum("obs").as("ct"))
    cells.join(broadcast(rowTot), xCol)
      .join(broadcast(colTot), yCol)
      .agg(sum("obs").as("n"),
           sum(col("obs") * log(col("ct") / col("obs"))).as("hc"),
           sum(col("obs") * log(col("rt"))).as("hx"),
           sum(col("obs") * col("obs") / (col("rt") * col("ct")))
             .as("q"))
      .select(
        ((log(col("n")) - col("hx") / col("n") - col("hc") / col("n")) /
           (log(col("n")) - col("hx") / col("n"))).as("theils_u"),
        sqrt(lit(1.0) - lit(1.0) / col("q")).as("contingency_c"),
        col("n").cast("long").as("n"))
  }

  /** Sliding-window funnel — the full ClickHouse `windowFunnel`
    * semantics: the chain may start at ANY step-1 occurrence (the
    * anchored [[funnel]] only tries the first one), each later step must
    * land strictly after the previous step and within `window` of ITS
    * OWN chain's start, and the level is the deepest any chain reaches.
    * Greedy earliest-next chaining per start is exact (taking the
    * earliest admissible next event only enlarges the feasible set for
    * the steps after it), so each stage is one STRICT forward as-of join
    * ([[Relational.asofJoinForward]]) from the surviving (start, t_prev)
    * rows to that step's events — per-stage cost is one union + one
    * per-key window pass, linear in events, never |starts| × |events|.
    * Returns (userCol, funnel_level) for every entity in `events`.
    */
  def funnelSliding(events: DataFrame, userCol: String, typeCol: String,
                    tsCol: String, steps: Seq[String],
                    window: String): DataFrame = {
    require(steps.nonEmpty, "funnelSliding needs at least one step")
    val e = events.select(col(userCol).as("u"), col(typeCol).as("et"),
                          col(tsCol).as("ts"))
    val s1 = e.filter(col("et") === steps.head)
      .select(col("u"), col("ts").as("t0"), col("ts").as("t_prev"))
    val stages = steps.tail.scanLeft(s1) { (prev, step) =>
      val r = e.filter(col("et") === step)
        .select(col("u"), col("ts"), col("ts").as("tn"))
      Relational.asofJoinForward(prev, r, "u", "t_prev", "ts", Seq("tn"),
                                 strict = true)
        .filter(col("asof_tn") <= col("t0") + expr(s"INTERVAL $window"))
        .select(col("u"), col("t0"), col("asof_tn").as("t_prev"))
    }
    val base = e.select(col("u")).distinct()
    stages.zipWithIndex.foldLeft(base) { case (acc, (st, i)) =>
      acc.join(st.select(col("u")).distinct()
                 .withColumn(s"l_$i", lit(1)),
               Seq("u"), "left")
    }
      .select(col("u").as(userCol),
              stages.indices.map(i => coalesce(col(s"l_$i"), lit(0)))
                .reduce(_ + _).cast("long").as("funnel_level"))
  }

  /** Rolling z-score anomaly flags: each row tested against the trailing
    * `lookback` rows of its own `keyCol` series (ordered by `tsCol`,
    * ties broken by `tieCol`). |z| > `sigma` is evaluated as the EXACT
    * integer predicate (v·n − s1)² > sigma²·(n·s2 − s1²) over the
    * pre-integerized `valueCol` (multiply the z definition through by
    * n²), so no mean/variance double ever exists and summation-order
    * drift cannot flip a boundary case — the property that lets
    * `q_win_zscore` hash-match DuckDB. Rows with fewer than `minN`
    * predecessors get `checked = false` (warm-up guard). Frame state is
    * bounded at `lookback` rows per series; with integer values ≤ 10⁵
    * and lookback ≤ 100 every product stays under 2⁶³.
    *
    * Input `valueCol` must already be an integer column (cent-scale
    * upstream). Output: input columns + `checked`, `anomaly`.
    */
  def rollingZscoreFlags(df: DataFrame, keyCol: String, tsCol: String,
                         tieCol: String, valueCol: String,
                         lookback: Int = 100, minN: Int = 30,
                         sigma: Int = 3): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsCol, tieCol)
      .rowsBetween(-lookback, -1)
    val v = col(valueCol)
    df.withColumn("__n", count(v).over(w))
      .withColumn("__s1", sum(v).over(w))
      .withColumn("__s2", sum(v * v).over(w))
      .withColumn("checked", col("__n") >= minN)
      .withColumn("anomaly",
        col("checked") &&
          (v * col("__n") - col("__s1")) * (v * col("__n") - col("__s1"))
            > lit(sigma.toLong * sigma) *
                (col("__n") * col("__s2") - col("__s1") * col("__s1")))
      .drop("__n", "__s1", "__s2")
  }
}
