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
    * non-overlapping counting, and greedy matching is one integer fold
    * over the entity's time-ordered event types: the accumulator counts
    * total matched steps (acc / n = completed sequences, acc % n = the
    * step the automaton is waiting for). One hash aggregate builds the
    * per-entity array (sorted in-memory per entity, never a global sort);
    * the fold is a codegen'd higher-order function.
    */
  def sequenceCount(events: DataFrame, userCol: String, typeCol: String,
                    tsCol: String, orderCol: String,
                    steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "sequenceCount needs at least one step")
    val n = steps.size
    val stepArr = array(steps.map(lit): _*)
    events
      .groupBy(col(userCol))
      .agg(transform(
        array_sort(collect_list(struct(col(tsCol), col(orderCol),
                                       col(typeCol).as("et")))),
        e => e.getField("et")).as("evs"))
      .select(col(userCol),
              (aggregate(col("evs"), lit(0),
                 (acc, t) => when(t === element_at(stepArr,
                                    pmod(acc, lit(n)) + 1), acc + 1)
                               .otherwise(acc)) / n).cast("long")
                .as("n_matches"))
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
}
