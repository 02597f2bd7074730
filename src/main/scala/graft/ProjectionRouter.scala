package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference,
  Cast, Coalesce, Divide, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression,
  AggregateFunction, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter,
  LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** ClickHouse `PROJECTION` analog (the destination engine's
  * automatically-routed pre-aggregated alternative layout,
  * `ALTER TABLE … ADD PROJECTION (SELECT keys, agg() GROUP BY keys)`):
  * a registered base table gains a parquet side-table holding partial
  * aggregates per key combination, and the optimizer REWRITES qualifying
  * aggregate queries over the base relation to re-aggregate the partials
  * instead — the user keeps querying the base table, the scan shrinks
  * from raw rows to one row per key combination. The 100 TB win is the
  * same as ClickHouse's: a daily-rollup question over years of raw events
  * reads the rollup, not the events.
  *
  * Routing is deliberately conservative — it fires only when the rewrite
  * is exactly answer-preserving from the partials:
  *  - the aggregate's child is the registered base relation — bare,
  *    under an attribute-only column-pruning Project, and/or under
  *    Filters whose conditions touch ONLY projection keys (partials
  *    are per key combination, so key-only selection commutes with the
  *    re-aggregation; any non-key reference blocks routing);
  *  - every grouping expression is a plain column ⊆ the projection keys
  *    (coarser-than-projection groupings re-aggregate partials — the
  *    MergeTree merge rule);
  *  - every aggregate is `count(literal)` → sum of stored counts (null-
  *    guarded back to count's non-null contract), or `sum/min/max` of a
  *    stored measure → the same function over the stored partial;
  *    DISTINCT or filtered aggregates never route.
  * Floating-point caveat (same as ClickHouse): re-aggregating stored
  * double partials can differ from a raw scan in final ulps; integer and
  * decimal measures are exact.
  */
object ProjectionRouter extends Rule[LogicalPlan] {

  /** One registered projection: `basePath`'s raw rows are pre-aggregated
    * by `keys` into `path`, whose schema is keys ++ `cnt` ++
    * (`sum_<m>`, `min_<m>`, `max_<m>`) per measure — the layout
    * [[writeProjection]] produces.
    */
  case class Projection(basePath: String, path: String, keys: Set[String],
                        measures: Set[String])

  // several projections may serve one base (ClickHouse keeps a set and
  // picks per query); the router chooses the cheapest qualifying one
  private val registry =
    new scala.collection.concurrent.TrieMap[String, List[Projection]]()

  /** Fully-qualified path string (scheme + authority + path) — bare
    * `toUri.getPath` would make `s3a://bucketA/x` and `file:/x` collide
    * and route one table to another's partials. Qualification goes
    * through a driver-side Hadoop FileSystem lookup, so results are
    * memoized per raw string: the router normalizes on every qualifying
    * Aggregate of every query, and planning latency must not carry a
    * filesystem round-trip each time. (Qualification of a given string
    * is deterministic for a given default FS; [[clear]] drops the cache
    * alongside the registry.)
    */
  private val normCache =
    new scala.collection.concurrent.TrieMap[String, String]()

  private def normalize(p: String): String =
    normCache.getOrElseUpdate(p, {
      val path = new org.apache.hadoop.fs.Path(p)
      val conf = SparkSession.active.sessionState.newHadoopConf()
      path.getFileSystem(conf).makeQualified(path).toString
    })

  def register(p: Projection): Unit = {
    val key = normalize(p.basePath)
    registry.put(key,
      p :: registry.getOrElse(key, Nil).filterNot(_.path == p.path))
  }

  def clear(): Unit = { registry.clear(); normCache.clear() }

  // routed-rewrite counter — the observable proof a query REALLY served
  // from partials (specs assert it alongside the plan's path)
  private val hits = new java.util.concurrent.atomic.AtomicLong(0)
  def hitCount: Long = hits.get()

  /** Measure types the partial-reaggregation rewrites are exact AND
    * type-stable for WITHOUT any cast: Sum/Average over these keep the
    * original expression's dataType (sum(long)=long,
    * sum(double)=double). DecimalType routes for Sum only, through an
    * explicit cast back to the original dataType in [[route]] (the
    * re-sum widens precision a second time, p+10 → p+20); Average over
    * decimal keeps its own scale rules the ratio form wouldn't
    * reproduce, so it stays unrouted.
    */
  private val exactMeasureTypes: Set[org.apache.spark.sql.types.DataType] =
    Set(org.apache.spark.sql.types.DoubleType, LongType,
        org.apache.spark.sql.types.IntegerType)

  /** Build + write the projection table for `base` (call after loads,
    * like ClickHouse's MATERIALIZE PROJECTION). One hash aggregate with
    * map-side partials; the output is one row per live key combination.
    */
  def writeProjection(base: DataFrame, keys: Seq[String],
                      measures: Seq[String], path: String): Unit =
    base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
           measures.flatMap(m => Seq(
             sum(col(m)).as(s"sum_$m"),
             min(col(m)).as(s"min_$m"),
             max(col(m)).as(s"max_$m"),
             // non-null count — avg() must divide by it, not by cnt
             count(col(m)).as(s"nn_$m"))): _*)
      .write.mode("overwrite").parquet(path)

  private def projectionsFor(plan: LogicalPlan): List[Projection] =
    plan match {
      case lr: LogicalRelation => lr.relation match {
        // single-root relations only: a multi-path read mixes other
        // paths' rows the projection doesn't cover
        case hfs: HadoopFsRelation if hfs.location.rootPaths.length == 1 =>
          registry.getOrElse(
            normalize(hfs.location.rootPaths.head.toString), Nil)
        case _ => Nil
      }
      case _ => Nil
    }

  /** Strip the answer-preserving operators between the Aggregate and the
    * base relation: attribute-only column-pruning Projects (free) and
    * Filters, whose conditions are returned outermost-first for
    * [[canRoute]] to vet. A filter over PROJECTION KEYS only is
    * answer-preserving from partials — every stored partial row belongs
    * to exactly one key combination, so selecting key combinations
    * before re-aggregation equals selecting raw rows before
    * aggregation. Any other operator stops the decomposition.
    */
  private def decompose(plan: LogicalPlan)
      : (Seq[Expression], LogicalPlan) = plan match {
    case f: Filter =>
      val (fs, base) = decompose(f.child)
      (f.condition +: fs, base)
    case p: Project
        if p.projectList.forall(_.isInstanceOf[AttributeReference]) =>
      decompose(p.child)
    case other => (Nil, other)
  }

  /** A filter condition routes iff it is deterministic, references ONLY
    * projection keys (a measure/non-key reference would filter raw rows
    * INSIDE a key combination — unanswerable from partials), and hosts
    * no subquery (whose own plan the rewrite must not detach).
    */
  private def routableFilter(cond: Expression, proj: Projection): Boolean =
    cond.deterministic &&
      cond.references.forall(a => proj.keys.contains(a.name)) &&
      cond.find(_.isInstanceOf[
        org.apache.spark.sql.catalyst.expressions.PlanExpression[_]]).isEmpty

  private def routableFn(fn: Expression, proj: Projection): Boolean =
    fn match {
      // count of a NON-NULL literal only: count(lit(null)) is 0 per
      // group, not the stored row count
      case c: Count =>
        c.children.forall(ch => ch.foldable && ch.eval() != null)
      // sum routes as Sum(stored sum): type-stable directly for the
      // integral/floating measures (see [[exactMeasureTypes]]); for
      // DECIMAL measures the re-sum widens precision a second time
      // (p+10 → p+20), so [[route]] casts the result back to the
      // original Sum's dataType — exact whenever the original query
      // itself wouldn't overflow, and null on overflow exactly where
      // the original Sum is null
      case s: Sum => s.child match {
        case a: AttributeReference =>
          proj.measures.contains(a.name) &&
            (exactMeasureTypes.contains(a.dataType) ||
             a.dataType.isInstanceOf[
               org.apache.spark.sql.types.DecimalType])
        case _ => false
      }
      // avg routes as sum_<m> / nn_<m>; restrict to double/integral
      // measures — decimal avg has its own scale rules the ratio form
      // wouldn't reproduce
      case av: Average => av.child match {
        case a: AttributeReference =>
          proj.measures.contains(a.name) &&
            exactMeasureTypes.contains(a.dataType)
        case _ => false
      }
      case m: Min => m.child match {
        case a: AttributeReference => proj.measures.contains(a.name)
        case _ => false
      }
      case m: Max => m.child match {
        case a: AttributeReference => proj.measures.contains(a.name)
        case _ => false
      }
      case _ => false
    }

  private def canRoute(agg: Aggregate, filters: Seq[Expression],
                       proj: Projection): Boolean = {
    val keysOk = agg.groupingExpressions.forall {
      case a: AttributeReference => proj.keys.contains(a.name)
      case _ => false
    }
    val aggsOk = agg.aggregateExpressions.forall {
      case a: AttributeReference => proj.keys.contains(a.name)
      case Alias(ae: AggregateExpression, _) =>
        !ae.isDistinct && ae.filter.isEmpty &&
          routableFn(ae.aggregateFunction, proj)
      case _ => false
    }
    keysOk && aggsOk && filters.forall(routableFilter(_, proj))
  }

  private def route(agg: Aggregate, filters: Seq[Expression],
                    proj: Projection): LogicalPlan = {
    val projPlan = SparkSession.active.read.parquet(proj.path)
      .queryExecution.analyzed
    def out(name: String): AttributeReference =
      projPlan.output.find(_.name == name).get
        .asInstanceOf[AttributeReference]
    val newGrouping = agg.groupingExpressions.map {
      case a: AttributeReference => out(a.name)
      case e => e
    }
    def reAgg(ae: AggregateExpression, fn: Expression): AggregateExpression =
      ae.copy(aggregateFunction = fn.asInstanceOf[AggregateFunction],
              resultId = NamedExpression.newExprId)
    val newAggs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference =>
        Alias(out(a.name), a.name)(exprId = a.exprId)
      case al @ Alias(ae: AggregateExpression, name) =>
        val newChild: Expression = ae.aggregateFunction match {
          case _: Count =>
            // count is non-null by contract; sum of counts over a
            // non-empty group can't be null, but keep the type honest
            Coalesce(Seq(reAgg(ae, Sum(out("cnt"))),
                         Literal(0L, LongType)))
          case s: Sum =>
            val m = s.child.asInstanceOf[AttributeReference].name
            val re = reAgg(ae, s.withNewChildren(Seq(out(s"sum_$m"))))
            // decimal re-sum widened precision again — restore the
            // alias's original type so downstream operators resolved
            // against it keep seeing the attribute they bound to
            if (re.dataType == ae.dataType) re
            else Cast(re, ae.dataType)
          case av: Average =>
            // avg = Σ(stored sums) / Σ(stored non-null counts) — two
            // aggregate expressions under one alias, both in double to
            // match Average's output type on the admitted measures
            val m = av.child.asInstanceOf[AttributeReference].name
            new Divide(
              Cast(reAgg(ae, Sum(out(s"sum_$m"))),
                   org.apache.spark.sql.types.DoubleType),
              Cast(reAgg(ae, Sum(out(s"nn_$m"))),
                   org.apache.spark.sql.types.DoubleType))
          case m: Min =>
            val c = m.child.asInstanceOf[AttributeReference].name
            reAgg(ae, Min(out(s"min_$c")))
          case m: Max =>
            val c = m.child.asInstanceOf[AttributeReference].name
            reAgg(ae, Max(out(s"max_$c")))
          case other =>
            throw new IllegalStateException(s"unroutable $other")
        }
        Alias(newChild, name)(exprId = al.exprId)
      case e => e
    }
    // the vetted key-only filters re-apply over the PARTIALS, rebound
    // to the projection table's attributes, preserving their original
    // nesting order
    val filteredChild = filters.foldRight(projPlan) { (cond, acc) =>
      Filter(cond.transform {
        case a: AttributeReference => out(a.name)
      }, acc)
    }
    hits.incrementAndGet()
    Aggregate(newGrouping, newAggs, filteredChild)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    // nothing registered → identity, with zero per-plan work: every
    // session with the extension installed pays this rule on every
    // query, so the empty-registry path must not touch the filesystem
    if (registry.isEmpty) plan else plan.transform {
    case agg: Aggregate =>
      // cheapest qualifying projection wins: fewer keys = fewer stored
      // partial rows to re-aggregate (the ClickHouse selection rule, by
      // cardinality proxy)
      val (filters, base) = decompose(agg.child)
      projectionsFor(base).filter(canRoute(agg, filters, _))
        .sortBy(_.keys.size).headOption match {
        case Some(proj) => route(agg, filters, proj)
        case None => agg
      }
  }
}
