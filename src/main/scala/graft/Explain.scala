package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{CollectLimitExec, ColumnarToRowExec,
  FilterExec, GlobalLimitExec, InputAdapter, LocalLimitExec,
  LocalTableScanExec, SparkPlan, TakeOrderedAndProjectExec,
  WholeStageCodegenExec}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference,
  EqualTo, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull,
  LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec,
  ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec,
  CartesianProductExec}
import org.apache.spark.sql.catalyst.optimizer.BuildRight
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition

/** Plan-audit helper. Three modes:
  *
  *  - `runMain graft.Explain <query> <sfDir>` — print one query's physical
  *    plan (truncated).
  *  - `runMain graft.Explain audit <sfDir>` — sweep every SparkEntry query
  *    and flag 100 TB red flags: cartesian products, unexpected
  *    nested-loop joins, single-partition exchanges, filters that never
  *    reached their scan, oversized plans. Whitelisted keys are not
  *    exempt from scrutiny: each whitelist entry's JUSTIFICATION is
  *    re-checked mechanically on the plan tree
  *    ([[unjustifiedSinglePartition]]/[[unjustifiedNestedLoop]]), so a
  *    whitelisted key whose plan stops satisfying its own justification
  *    is flagged again. Static inspection: AQE off (the adaptive
  *    wrapper's pre-EnsureRequirements tree hides exchanges).
  *  - `runMain graft.Explain audit-aqe <sfDir>` — the AQE-PARITY sweep:
  *    bench and production run AQE-on, so a broadcast demotion or an
  *    AQE-inserted shape could diverge from the audited static plan
  *    unseen. This mode EXECUTES each key (AQE on) and re-runs every
  *    check on the runtime-final adaptive plan, descending through
  *    query-stage boundaries.
  */
object Explain {

  /** Every node of the physical tree, descending through the AQE
    * wrapper, query stages, reused exchanges, and subquery plans
    * (scalar subqueries host their own exchanges — q_tpch_q22's
    * avg(acctbal) shape). `aqeFinal` picks which side of the adaptive
    * wrapper to descend: the pre-EnsureRequirements input (static
    * audit) or the runtime-current plan (executed-plan audit).
    */
  private[graft] def walk(p: SparkPlan,
                          aqeFinal: Boolean = false): Seq[SparkPlan] =
    p +: (p match {
      case a: AdaptiveSparkPlanExec =>
        walk(if (aqeFinal) org.apache.spark.sql.graft.AqeBridge.currentPlan(a)
             else a.inputPlan, aqeFinal)
      case r: ReusedExchangeExec => walk(r.child, aqeFinal)
      case q: QueryStageExec => walk(q.plan, aqeFinal)
      case _ => (p.children ++ p.subqueries).flatMap(walk(_, aqeFinal))
    })

  /** The mechanical form of every whitelist justification: rows
    * reaching this subtree's OUTPUT are "pre-aggregated or explicitly
    * bounded, never raw data" — true iff every leaf-ward path passes
    * through an aggregate (partial rows: one per group per upstream
    * partition), an explicit limit / top-k, or a tiny literal relation
    * before reaching a scan. A raw corpus flowing through proves
    * nothing and returns false.
    */
  private[graft] def rowBounded(p: SparkPlan): Boolean = p match {
    case _: BaseAggregateExec => true
    case _: GlobalLimitExec | _: LocalLimitExec |
         _: TakeOrderedAndProjectExec | _: CollectLimitExec => true
    case l: LocalTableScanExec => l.rows.size <= 1024
    // the broadcast-query idiom: a point filter (col = literal /
    // col IN (literals)) selects the query row(s) out of a table.
    // Not a hard cardinality proof (the column need not be unique),
    // but it mechanically separates "broadcast a point-selected probe"
    // from "broadcast the raw corpus", which is what the whitelist
    // justifications claim. Only TOP-LEVEL CONJUNCTS count: a point
    // shape buried inside Not/Or (e.g. lang != 'en', id < 5 OR
    // score > 0) keeps raw rows and must NOT certify the filter.
    case f: FilterExec if conjuncts(f.condition).exists {
      case EqualTo(_, _: Literal) | EqualTo(_: Literal, _) => true
      case In(_, vs) if vs.nonEmpty && vs.size <= 1024 &&
        vs.forall(_.isInstanceOf[Literal]) => true
      // the seed-set idiom: id < k for a SMALL non-negative INTEGRAL
      // literal k (dense non-negative ids → ≤ k rows); a fractional
      // literal is a selectivity threshold on a value column
      // (score < 0.9 keeps most of the corpus) and proves nothing
      case LessThan(_, l: Literal) => smallIntegral(l)
      case LessThanOrEqual(_, l: Literal) => smallIntegral(l)
      case _ => false
    } => true
    // fixed-cardinality TPC-H dimension tables: region (5 rows) and
    // nation (25) have SPEC-PINNED sizes at every scale factor — the
    // one class of bare scan that is legitimately broadcast-bounded.
    // EXACT base-name match: "nationwide_events" must not ride along.
    case s: FileSourceScanExec if s.relation.location.rootPaths.nonEmpty &&
      s.relation.location.rootPaths.forall { p =>
        val base = p.getName.toLowerCase(java.util.Locale.ROOT)
          .stripSuffix(".parquet")
        base == "region" || base == "nation"
      } => true
    case a: AdaptiveSparkPlanExec => rowBounded(a.inputPlan)
    case r: ReusedExchangeExec => rowBounded(r.child)
    case q: QueryStageExec => rowBounded(q.plan)
    case leaf if leaf.children.isEmpty => false
    case other => other.children.forall(rowBounded)
  }

  /** Top-level AND-split of a filter condition — the shapes
    * [[rowBounded]] accepts must be conjuncts, never sub-expressions
    * of a Not/Or that could invert or widen them.
    */
  private def conjuncts(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
    e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }

  /** A non-negative integral literal ≤ 1024 — the only comparison
    * bound the seed-range idiom accepts.
    */
  private def smallIntegral(l: Literal): Boolean = l.value match {
    case v: java.lang.Integer => v >= 0 && v <= 1024
    case v: java.lang.Long    => v >= 0L && v <= 1024L
    case v: java.lang.Short   => v >= 0 && v <= 1024
    case v: java.lang.Byte    => v >= 0
    case _ => false
  }

  /** SinglePartition exchanges whose input is NOT row-bounded — for a
    * `globalOrderExpected` key these violate the whitelist's own
    * justification ("moves one pre-aggregated row per partition").
    */
  private[graft] def unjustifiedSinglePartition(
      p: SparkPlan, aqeFinal: Boolean = false): Seq[SparkPlan] =
    walk(p, aqeFinal).collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning == SinglePartition &&
             !rowBounded(e.child) => e
    }

  /** BroadcastNestedLoopJoins whose BROADCAST side is not row-bounded —
    * for a `nestedLoopExpected` key these violate the justification
    * ("cross vs an explicitly broadcast ≤ k-row side"). The streamed
    * side may be arbitrarily large; the broadcast side must provably
    * not be raw data.
    */
  private[graft] def unjustifiedNestedLoop(
      p: SparkPlan, aqeFinal: Boolean = false): Seq[SparkPlan] =
    walk(p, aqeFinal).collect {
      case j: BroadcastNestedLoopJoinExec
          if !rowBounded(if (j.buildSide == BuildRight) j.right else j.left)
            => j
    }

  /** TRUE iff at least one parquet scan in the tree proves scan-level
    * pruning: a pushed data filter (the `PushedFilters` the reader
    * evaluates against row-group stats) or a partition filter (hive-dir
    * pruning). For [[pushdownExpected]] keys — whose semantics put a
    * selective predicate right on a table — an unpruned scan means the
    * engine is reading 100 TB to answer a filtered question.
    */
  private[graft] def scanPruned(p: SparkPlan,
                                aqeFinal: Boolean = false): Boolean =
    walk(p, aqeFinal).exists {
      case s: FileSourceScanExec =>
        s.partitionFilters.nonEmpty ||
        s.metadata.get("PushedFilters").exists(v => v.nonEmpty && v != "[]")
      case _ => false
    }

  /** FilterExec sitting DIRECTLY over a parquet scan (through the
    * columnar/codegen pass-throughs) carrying clearly-pushable
    * conjuncts (attribute-vs-literal comparisons / IN / null tests on
    * atomic types) while the scan itself received NO data filters and
    * NO partition filters — the mechanical smell of a pushdown that
    * silently stopped working (Catalyst pushes those shapes into
    * `dataFilters` whenever the planner is healthy, even for formats
    * that can't translate them further).
    */
  private[graft] def unpushedFilterOverScan(
      p: SparkPlan, aqeFinal: Boolean = false): Seq[SparkPlan] =
    walk(p, aqeFinal).collect {
      case f: FilterExec if scanBelow(f.child).exists(s =>
            s.dataFilters.isEmpty && s.partitionFilters.isEmpty) &&
          conjuncts(f.condition).exists(pushableConjunct) => f
    }

  /** The parquet scan reachable from `p` through ONLY the pass-through
    * wrappers codegen inserts between a filter and its scan.
    */
  private def scanBelow(p: SparkPlan): Option[FileSourceScanExec] =
    p match {
      case s: FileSourceScanExec => Some(s)
      case c: ColumnarToRowExec => scanBelow(c.child)
      case i: InputAdapter => scanBelow(i.child)
      case w: WholeStageCodegenExec => scanBelow(w.child)
      case q: QueryStageExec => scanBelow(q.plan)
      case _ => None
    }

  /** A conjunct every file source can at least record as a data filter:
    * a deterministic attribute-vs-literal comparison, IN-list, or null
    * test on an atomic-typed column. If even these never reached the
    * scan, pushdown is broken — complex/derived predicates are
    * legitimately left above and prove nothing.
    */
  private def pushableConjunct(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = {
    def atomic(a: AttributeReference): Boolean = a.dataType match {
      // anything non-nested: AtomicType itself is protected[sql]
      case _: org.apache.spark.sql.types.ArrayType |
           _: org.apache.spark.sql.types.MapType |
           _: org.apache.spark.sql.types.StructType |
           _: org.apache.spark.sql.types.VariantType => false
      case _ => true
    }
    e match {
      case EqualTo(a: AttributeReference, _: Literal) => atomic(a)
      case EqualTo(_: Literal, a: AttributeReference) => atomic(a)
      case LessThan(a: AttributeReference, _: Literal) => atomic(a)
      case LessThan(_: Literal, a: AttributeReference) => atomic(a)
      case LessThanOrEqual(a: AttributeReference, _: Literal) => atomic(a)
      case LessThanOrEqual(_: Literal, a: AttributeReference) => atomic(a)
      case GreaterThan(a: AttributeReference, _: Literal) => atomic(a)
      case GreaterThan(_: Literal, a: AttributeReference) => atomic(a)
      case GreaterThanOrEqual(a: AttributeReference, _: Literal) => atomic(a)
      case GreaterThanOrEqual(_: Literal, a: AttributeReference) => atomic(a)
      case In(a: AttributeReference, vs)
          if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) => atomic(a)
      case IsNull(a: AttributeReference) => atomic(a)
      case IsNotNull(a: AttributeReference) => atomic(a)
      case _ => false
    }
  }

  // Keys whose semantics put a selective predicate (or partition
  // filter) directly on a base-table scan: the audit asserts the
  // pushdown actually REACHED the FileSourceScanExec — at 100 TB an
  // unpruned scan behind these is a full-corpus read for a filtered
  // answer.
  private val pushdownExpected = Set(
    "q_filter",     // three pushable lineitem predicates
    "q_filter_in",  // IN-list predicate
    "q_tpch_q6")    // the classic pushdown-sensitive scan-agg
  // (q_filter_null filters a DERIVED nullif() column inside a
  //  disjunction — legitimately unpushable, so it proves nothing)

  // Keys whose scale story is COLUMN pruning: the named column must
  // never appear in any scan's output (a metadata-only media read that
  // drags the payload bytes through the scan reads the whole 100 TB to
  // answer a catalog question).
  private val colPruneExpected = Map(
    "q_multimodal_meta" -> "text") // payload source column

  /** TRUE iff some parquet scan in the tree reads `column` — the
    * column-pruning audit for [[colPruneExpected]] keys.
    */
  private[graft] def scanReadsColumn(p: SparkPlan, column: String,
                                     aqeFinal: Boolean = false): Boolean =
    walk(p, aqeFinal).exists {
      case s: FileSourceScanExec => s.output.exists(_.name == column)
      case _ => false
    }

  // Queries where a nested-loop/cartesian operator is the intended plan
  // (bounded dims or an explicitly broadcast side).
  private val nestedLoopExpected = Set(
    "q_join_range", "q_join_cross", "q_cosine_sim", "q_simsearch_topk",
    "q_simsearch_lsh", "q_simsearch_lsh_mp", "q_simsearch_ivf",
    "q_dedup_embed", "q_text_tfidf",
    "q_dedup_embed_lsh",    // recall certificate: labeled quadratic
                            // exact side (the q_dedup_embed shape) +
                            // one-row count cross
    "q_knn_join",           // scores vs explicitly broadcast query set
    "q_cluster_assign",     // cross vs explicitly broadcast seed set
    "q_dedup_semantic",     // cross vs explicitly broadcast 8-seed set
    "q_simsearch_kmeans",   // 1-row broadcast probe + 1-row query cross
    "q_simsearch_ivf_recall",   // ANN + exact sides, both vs broadcast query
    "q_simsearch_pq_recall",    // same: recall certificates re-run the ANN
    "q_simsearch_ivfpq_recall", // paths, every cross side is the 1-row query
    "q_simsearch_lsh_recall",   // or the bounded centroid/probe set
    "q_simsearch_lsh_mp_recall", // multi-probe recall certificate: same
                                 // 1-row broadcast query crosses
    "q_simsearch_sq8_recall",    // SQ8 recall certificate: ANN + exact
                                 // sides both cross the 1-row query
    "q_simsearch_hamming_recall", // binary-ANN certificate: Hamming
                                  // shortlist + rerank vs 1-row query
    "q_simsearch_cascade_recall", // cascade certificate: every stage
                                  // crosses the same 1-row query
    "q_simsearch_rp_recall",      // JL-projection certificate: shortlist
                                  // + rerank + exact, all vs the 1-row
                                  // broadcast query
    "q_text_logprob",       // cross vs broadcast one-row total
    "q_sample_temperature", // cross vs broadcast one-row global max rate
    "q_theta_segments",     // cross of two one-row sketch aggregates
    "q_text_bm25",          // cross vs broadcast one-row (N, avgdl) stats
    "q_stream_bm25",        // same serve shape over the streaming-built
                            // index: one-row (N, avgdl) stats cross +
                            // broadcast per-term df (bounded by |terms|)
    "q_agg_ks_test",        // cross vs broadcast one-row (n1, n2) totals
    "q_text_ngram_lm",      // cross vs broadcast one-row vocabulary size
    "q_dsir",               // cross vs broadcast one-row token totals
    "q_classify_nb",        // cross vs broadcast one-row totals/priors
    "q_mmr_rerank",         // cross vs broadcast <= 5-row selected set
    "q_rrf_fusion",         // lexical leg's one-row (N, avgdl) stats
                            // cross + dense leg's 1-row query cross
    "q_graph_pagerank",     // cross vs broadcast one-row node count
                            // (edge-target modulus)
    "q_graph_trustrank",    // same one-row count cross (seed split)
    "q_split_leakage_safe", // cross vs broadcast one-row no-span proof
    "q_bpe_train",          // per-round cross vs broadcast 1-row argmax
    "q_bpe_apply",          // same rounds + one-row stats crosses
    "q_mix_allocate",       // two one-row crosses (total tokens, floor
                            // sum) against the bounded source table
    "q_bitext_mine",        // labeled-quadratic exact margin baseline:
                            // cross vs the explicitly broadcast smaller
                            // language shard (banded path = embed-LSH)
    "q_curation_rag",       // inherits q_dsir's one-row totals cross
    "q_win_ntile",          // cross vs broadcast one-row (min,max) + count
                            // aggregates (in-plan bucketing + n)
    "q_global_rownum_inplan", // cross vs broadcast one-row (min,max)
                              // range-stats aggregate
    "q_pack_sequences_inplan") // same range-stats cross (in-plan
                               // prefix-sum bucketing)

  // Keys whose nested-loop join is an INTENTIONALLY quadratic labeled
  // baseline or recall certificate — never the production path. The
  // mechanical obligation for these is different: the named scale-path
  // sibling must still be a registered query key (a certificate without
  // its production counterpart is a dead label). A self-mapping means
  // the production path is embedded in the same key (the certificate
  // computes ann/exact on both legs in one plan).
  private val quadraticBaseline: Map[String, String] = Map(
    // the production path is q_dedup_embed_lsh_pairs (banded LSH alone,
    // benched since r12 — the fused certificate key measured e = 1.81
    // on the second decade purely from its exact leg)
    "q_dedup_embed" -> "q_dedup_embed_lsh_pairs",
    "q_dedup_embed_lsh" -> "q_dedup_embed_lsh_pairs",
    "q_join_range" -> "q_join_range_bucketed")  // bucketed hash-join path
  // Operators where a SinglePartition exchange is semantically required
  // AND cheap: global aggregates move one pre-aggregated row per upstream
  // partition (q_agg_global, q_profile, tfidf's scalar doc count); global
  // ranking windows are documented single-task (scalable variant:
  // q_global_rownum).
  private val globalOrderExpected = Set(
    "q_topn", "q_scan", "q_sort", "q_project",
    "q_agg_global", "q_profile", "q_text_tfidf",
    "q_subquery_scalar", // scalar subquery = one-row global aggregate
    "q_tpch_q22",        // scalar avg(acctbal) subquery, same shape
    "q_tpch_q15",        // scalar max over the pre-shrunk revenue view
    "q_tpch_q11",        // scalar threshold subquery: one-row global
                         // aggregate over the already-grouped partials
    "q_tpch_q6", "q_tpch_q14", // global scalar aggs: one partial row each
    "q_tpch_q17", "q_tpch_q19", // single-row revenue aggregates, same shape
    "q_text_logprob",          // broadcast scalar corpus-total aggregate
    "q_sample_temperature",    // one-row max over the 5-row rate table
    "q_topk_merge",            // global sketch-combine: one partial
                               // ApproxTopK state per day, never raw rows
    "q_theta_segments",        // two one-row theta-sketch aggregates
                               // crossed for the set algebra
    "q_dedup_embed_lsh",       // two one-row counts (n_lsh, n_exact)
                               // crossed for the recall certificate
    "q_dedup_embed_lsh_pairs", // one-row global pair count over the
                               // banded-LSH verified pairs (one
                               // pre-aggregated partial per partition)
    "q_text_bm25",             // one-row corpus-stats aggregate (N, avgdl)
    "q_stream_bm25",           // same one-row stats aggregate, read off
                               // the per-batch partial table
    "q_agg_ols",               // one-row normal-equation sums: one
                               // pre-aggregated partial row per partition
    "q_dsir",                  // one-row corpus/target token totals over
                               // the 4096-row bucket table
    "q_classify_nb",           // one-row class-total and prior aggregates
    "q_mmr_rerank",            // bounded shortlist top-1 argmax per step
    "q_rrf_fusion",            // one-row corpus stats + two bounded
                               // top-RrfLegK TakeOrdered legs, rank
                               // windows over <= 20 rows
    "q_graph_pagerank",        // one-row node-count aggregate; the
                               // final top-20 is TakeOrdered
    "q_graph_trustrank",       // same shape, seed-personalized
    "q_split_leakage_safe",    // one-row max-splits-per-cluster proof
    "q_mix_allocate",          // remainder-rank window over the
                               // |sources|-row quota table + one-row
                               // total/floor-sum aggregates
    "q_bpe_train",             // one-row argmax (TakeOrdered) per round
    "q_bpe_apply",             // same + one-row stats aggregates
    "q_curation_rag",          // inherits q_dsir's one-row totals
    // global one-row STATISTIC aggregates (q_agg_global shape): the
    // exchange moves one pre-aggregated partial row per upstream
    // partition, never raw data
    "q_agg_welch_t", "q_agg_cramers_v", "q_agg_mannwhitney_u",
    "q_agg_rank_corr", "q_agg_ks_test", "q_agg_student_t",
    "q_agg_theils_u",
    "q_agg_corr_matrix",       // one-row six-way corr aggregate
    "q_agg_covar_matrix",      // one-row six-way covar aggregate
    "q_retention_conditions",  // one-row flag-vector rollup
    "q_text_ngram_lm",         // one-row vocabulary-size aggregate
    "q_hash_xx",               // one-row hash-invariant aggregate
    "q_win_ntile",             // one-row count aggregate (in-plan n) +
                               // offset window over bucket-count partials
    "q_global_rownum_inplan",  // offset window over the <= buckets+1
                               // PRE-AGGREGATED bucket-count rows
    "q_pack_sequences_inplan") // offset window over the pre-aggregated
                               // bucket-sum rows (same shape)

  /** The audit flag set for one named query's physical tree. `aqeFinal`
    * selects which side of adaptive wrappers the node walk descends.
    */
  private[graft] def auditFlags(name: String, phys: SparkPlan,
                                aqeFinal: Boolean): Seq[String] = {
    val nodes = walk(phys, aqeFinal)
    val plan = phys.toString
    Seq(
      "CartesianProduct" ->
        nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "BroadcastNestedLoopJoin" ->
        (nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]) &&
         !nestedLoopExpected(name)),
      "SinglePartition-exchange" ->
        (nodes.exists {
          case e: ShuffleExchangeExec =>
            e.outputPartitioning == SinglePartition
          case _ => false
        } && !globalOrderExpected(name)),
      // whitelisted keys: re-check the justification itself on
      // the plan tree — the whitelist is not a free pass
      "BNLJ-unjustified-broadcast-side" ->
        (nestedLoopExpected(name) &&
         !quadraticBaseline.contains(name) &&
         unjustifiedNestedLoop(phys, aqeFinal).nonEmpty),
      "quadratic-baseline-sibling-missing" ->
        quadraticBaseline.get(name)
          .exists(sib => !SparkEntry.queries.contains(sib)),
      "SinglePartition-unjustified-input" ->
        (globalOrderExpected(name) &&
         unjustifiedSinglePartition(phys, aqeFinal).nonEmpty),
      // scan-level pruning: pushdown-sensitive keys must show a pruned
      // scan; NO key may carry a pushable filter its scan never saw
      "pushdown-missing" ->
        (pushdownExpected(name) && !scanPruned(phys, aqeFinal)),
      "column-prune-missing" ->
        colPruneExpected.get(name)
          .exists(c => scanReadsColumn(phys, c, aqeFinal)),
      "filter-over-unpruned-scan" ->
        unpushedFilterOverScan(phys, aqeFinal).nonEmpty,
      "plan>200KB" -> (plan.length > 200000)
    ).collect { case (f, true) => f }
  }

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val aqe = mode == "audit-aqe"
    // Relational.harnessSession matches the Bench/Verify sessions' conf
    // pairs so the audit inspects the same plans those sessions execute
    // (boundedWindow's literal partition spec survives — see
    // Relational.boundedWindow).
    val spark = Relational.harnessSession(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // static plan inspection wants the POST-EnsureRequirements tree:
      // under AQE the wrapper's inputPlan carries no exchange nodes yet,
      // which would silently blind the SinglePartition checks. The
      // audit-aqe mode instead EXECUTES each key with AQE on and audits
      // the runtime-final adaptive plan — what bench/production run.
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    mode match {
      case "audit" | "audit-aqe" =>
        val dir = args(1)
        var flagged = 0
        SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
          try {
            val df = fn(spark, dir)
            // drive AQE to its runtime-final plan WITHOUT materializing
            // the result on the driver (collect() of a row-heavy key
            // would OOM the local[4] audit on larger scale factors):
            // toRdd executes the SAME queryExecution the audit reads
            if (aqe) df.queryExecution.toRdd.foreach(_ => ())
            val phys = df.queryExecution.executedPlan
            val flags = auditFlags(name, phys, aqe)
            if (flags.nonEmpty) {
              flagged += 1
              println(s"[audit] $name: ${flags.mkString(", ")}")
            }
          } catch {
            case e: Throwable =>
              flagged += 1
              println(s"[audit] $name: PLAN ERROR ${e.getMessage.take(120)}")
          }
        }
        println(s"[audit] done, $flagged flagged of " +
          s"${SparkEntry.queries.size}")
      case "formatted" =>
        // `runMain graft.Explain formatted <sfDir> <outDir> <k1,k2,...>` —
        // dump each key's FULL `.explain("formatted")` text (the
        // optimization-round evidence files under plans/r*/): static
        // post-EnsureRequirements tree, AQE off, so every Exchange and
        // join strategy is visible (the adaptive wrapper's pre-execution
        // tree hides exchanges).
        val dir = args(1)
        val outDir = java.nio.file.Paths.get(args(2))
        java.nio.file.Files.createDirectories(outDir)
        // INTERNAL stage plans for keys whose distributed work runs during
        // DataFrame CONSTRUCTION (eager localCheckpoint / bounded collect):
        // the registered key's final plan is a LocalTableScan, so the
        // optimization evidence is the internal stage's plan.
        val internal: Map[String,
          (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
          "x_pca_scatter_partials" ->
            ((s, d) => LlmOps.scatterPartials(Tables(s, d, "embeddings"))),
          // plan-evidence reconstruction of the r15 scatter shape (the
          // pre-r16 self-join form, minus its eager localCheckpoint so
          // the full lineage stays visible in one plan) — exists ONLY so
          // plans/r16 carries a checkable before/after pair for the
          // scatter rewrite; never a query path
          "x_pca_scatter_partials_r15" -> ((s, d) => {
            import org.apache.spark.sql.functions._
            val x = Tables(s, d, "embeddings")
              .select(col("vec_id"),
                      posexplode(col("embedding")).as(Seq("p", "xv")))
              .select(col("vec_id"), (col("p") + 1).cast("long").as("i"),
                      expr("CAST(floor(CAST(xv AS DOUBLE) * 10000.0) " +
                           "AS BIGINT)").as("x"))
            x.join(x.select(col("vec_id"), col("i").as("j"),
                            col("x").as("y")), "vec_id")
              .groupBy("i", "j")
              .agg(expr("CAST(sum(CAST(x * y AS DECIMAL(38,0))) " +
                        "AS BIGINT)").as("v"))
          }))
        args(3).split(",").foreach { q =>
          val txt = internal.getOrElse(q, SparkEntry.queries(q))(spark, dir)
            .queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(outDir.resolve(s"$q.txt"), txt)
          println(s"[formatted] $q -> ${outDir.resolve(s"$q.txt")}")
        }
      case q =>
        val plan = SparkEntry.queries(q)(spark, args(1))
          .queryExecution.executedPlan.toString
        println("PLANSIZE chars=" + plan.length)
        println(plan.linesIterator.take(80).map(_.take(220)).mkString("\n"))
    }
    spark.stop()
  }
}
