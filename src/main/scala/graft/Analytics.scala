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
}
