package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-data-pipeline operators (SURVEY.md §2.10, L1-L7 + BASELINE.json
  * north_star): dedup (exact, MinHash-LSH, SimHash, n-gram Jaccard,
  * embedding cosine), similarity search (brute-force + LSH-bucketed ANN),
  * and text analysis (token stats, quality, language-ID, fingerprints).
  *
  * Everything is built from codegen'd built-ins and higher-order functions
  * — no UDFs, no driver-side loops. The only shuffles are the
  * bucket/candidate-pair exchanges inherent to the algorithms, which is
  * what makes them 100 TB-viable: cost scales with bucket collision counts,
  * not with the quadratic all-pairs space.
  */
object LlmOps {

  def tokens(text: Column): Column = split(text, " ")

  /** Tokenizer with an opt-in normalizing mode — the pass a real crawl
    * needs before any token statistic: lowercase, punctuation → space,
    * empty tokens dropped. Pure codegen'd built-ins (lower +
    * regexp_replace + split + higher-order filter, no UDF), and the
    * DuckDB oracles replicate the exact same expression, so both engines
    * see identical token streams on any corpus — not just the
    * punctuation-free synthetic fixture (where it is a no-op by
    * construction). `normalize = false` is the bare whitespace split the
    * dedup/fingerprint oracles were written against.
    */
  def tokens(text: Column, normalize: Boolean): Column =
    if (!normalize) tokens(text)
    // native [[TokensNorm]] pass (r16) — previously
    // filter(split(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " "),
    //        t -> t != ""): a regex pass + a regex split + an
    // interpreted filter HOF per document. Byte-identical token streams
    // (TokensNormSpec pins the equivalence on adversarial Unicode).
    else org.apache.spark.sql.graft.ColumnBridge.column(
      TokensNorm(org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  /** Distinct k-token shingles of a token array (empty when < k tokens).
    * Native [[KGrams]] loop (r16) — previously an interpreted
    * transform+slice+concat_ws HOF plus array_distinct; byte-identical
    * output (KGramsSpec pins the equivalence).
    */
  def shingles(toks: Column, k: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      KGrams(org.apache.spark.sql.graft.ColumnBridge.expression(toks),
             k, distinct = true))

  /** All k-token n-grams in order, duplicates kept — repetition analysis
    * needs the multiset ([[shingles]] dedups for Jaccard). Same native
    * [[KGrams]] loop.
    */
  def ngramsAll(toks: Column, k: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      KGrams(org.apache.spark.sql.graft.ColumnBridge.expression(toks),
             k, distinct = false))

  /** Non-overlapping k-token chunks (trailing partial chunk dropped) —
    * the "line"/paragraph unit for corpus-wide exact chunk dedup on a
    * corpus without newlines. Native [[KGrams]] loop at stride k (r16;
    * previously an interpreted transform+slice+concat_ws HOF).
    */
  def chunksOf(toks: Column, k: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      KGrams(org.apache.spark.sql.graft.ColumnBridge.expression(toks),
             k, distinct = false, stride = k))

  /** Content-defined chunking: a token STARTS a new chunk when its
    * portable hash ≡ 0 (mod `modulus`), so chunk boundaries are decided by
    * content, not position — inserting one token near the start of a
    * document shifts every fixed-width chunk ([[chunksOf]]) but leaves all
    * content-defined chunks after the next boundary byte-identical (the
    * rsync/dedup-storage trick, applied to corpus chunk dedup). Expected
    * chunk length = `modulus` tokens.
    *
    * Relational form: posexplode → per-doc boundary prefix-count (the
    * window partitions by document, so no global sort), one hash aggregate
    * rebuilds chunk strings. The hash is the md5-prefix used by the
    * fingerprint ops — portable, so a SQL oracle reproduces boundaries
    * bit-for-bit. Returns (doc, chunk).
    */
  def contentChunks(docs: DataFrame, idCol: String, textCol: String,
                    modulus: Int): DataFrame = {
    val h = org.apache.spark.sql.graft.ColumnBridge.column(
      Md5PrefixLong(org.apache.spark.sql.graft.ColumnBridge
                      .expression(col("tok")), 8))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc").orderBy("pos")
    docs
      .select(col(idCol).as("doc"),
              posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
      .withColumn("flag", when(pmod(h, lit(modulus)) === 0, 1L)
                            .otherwise(0L))
      .withColumn("chunk_id", sum("flag").over(w))
      .groupBy("doc", "chunk_id")
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
                  x => x.getField("tok"))).as("chunk"))
      .select("doc", "chunk")
  }

  /** Self-trained bigram language-model cross-entropy per document — the
    * KenLM-style quality signal (CCNet/RefinedWeb filter on LM
    * perplexity) without an external model: train add-1-smoothed bigram
    * statistics ON the corpus itself, score each document by the mean
    * negative log-probability of its bigrams. Outlier documents
    * (gibberish, boilerplate repetition) sit far from the corpus mode.
    *
    * Fully relational: one token explode (linear), two hash-aggregate
    * count tables (unigram, bigram), shuffle joins back on `w1` /
    * `(w1, w2)` — the count tables are corpus-vocabulary sized so they
    * are NOT broadcast, and a hot bigram is a shuffled-join skew AQE
    * can split. The vocabulary size is a one-row broadcast.
    * P(w₂|w₁) = (c(w₁,w₂)+1)/(c(w₁)+V); c(w₁,w₂) ≤ c(w₁) and V ≥ 1 so
    * every term is a true probability. Documents with < 2 tokens emit
    * no bigrams and are dropped. Returns (idCol, xent, n_bigrams).
    */
  def ngramLmScore(docs: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    // NO spread here (measured +0.4 s at sf0.1): the dominant cost is
    // the bigram-instance ⋈ stats join chain below, whose exchanges
    // only grow with more map-side partial-agg partitions — the
    // fan-out itself is light relative to them.
    // NO Mat.bigRel of `toks` either (r16, measured and REJECTED): the
    // four derivations below each re-tokenize, but the whole 4-pass
    // form costs only ~3.5 s executor CPU at sf0.1 — a DISK_ONLY
    // checkpoint of (id, array<string>) rows costs ~32 s CPU in
    // round-trip serialization alone (StageProbe A/B), ~10× the work
    // it saves. Recompute-over-round-trip, the [[Mat]] `none` rationale.
    val toks = docs.select(col(idCol),
                           tokens(col(textCol), normalize = true).as("tk"))
    val bg = toks
      .select(col(idCol), explode(
        when(size(col("tk")) >= 2,
             transform(sequence(lit(1), size(col("tk")) - 1),
                       i => struct(element_at(col("tk"), i).as("w1"),
                                   element_at(col("tk"), i + 1).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
        .as("b"))
      .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val uni = toks.select(explode(col("tk")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).cast("double").as("cu"))
    val vocab = uni.agg(count(lit(1)).cast("double").as("vocab"))
    val bgc = bg.groupBy("w1", "w2")
      .agg(count(lit(1)).cast("double").as("cb"))
    bg.join(bgc, Seq("w1", "w2"))
      .join(uni, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .groupBy(idCol)
      .agg(avg(-log((col("cb") + 1) / (col("cu") + col("vocab"))))
             .as("xent"),
           count(lit(1)).cast("long").as("n_bigrams"))
  }

  /** Self-trained multinomial Naive Bayes classifier — the relational
    * analog of the fastText-style quality/language classifier every
    * curation pipeline runs, chosen over logistic regression because NB
    * training is PURE COUNTING: add-1-smoothed per-(token, class) counts
    * and doc priors are exact integers, so the whole train+predict path
    * is deterministic and cross-engine hash-checkable.
    *
    * Shapes: the (token × class) count table is ONE conditional hash
    * aggregate over the exploded tokens (C conditional counts per token —
    * classes are a small fixed set, tokens are not); per-token floored
    * log-likelihood scores join back to the token stream SHUFFLED (a
    * 100 TB vocabulary outgrows any broadcast; hot stop-word tokens are
    * AQE-splittable skew); the per-doc per-class sums are integer
    * arithmetic (each token score floored to 1e-4 BEFORE summing), and
    * the argmax is a fixed CASE chain (earlier class wins ties — the
    * deterministic contract). Priors ride a broadcast one-row aggregate.
    */
  def nbClassify(docs: DataFrame, idCol: String, textCol: String,
                 classCol: String, classes: Seq[String]): DataFrame = {
    require(classes.nonEmpty, "nbClassify needs at least one class")
    val tok = docs.select(col(idCol), col(classCol).as("__c"),
                          explode(tokens(col(textCol), normalize = true))
                            .as("w"))
      .localCheckpoint() // feeds both the count aggregate and scoring
    val countCols = classes.map(c =>
      count(when(col("__c") === c, 1)).as(s"n_$c"))
    val counts = tok.groupBy("w").agg(countCols.head, countCols.tail: _*)
    val totCols = classes.map(c => sum(s"n_$c").as(s"t_$c")) :+
      count(lit(1)).as("v")
    val totals = counts.agg(totCols.head, totCols.tail: _*)
    val scores = counts.crossJoin(broadcast(totals))
      .select(col("w") +: classes.map(c => expr(
        s"CAST(floor(ln((CAST(n_$c AS DOUBLE) + 1) / " +
          s"(CAST(t_$c AS DOUBLE) + CAST(v AS DOUBLE))) * 10000) " +
          s"AS BIGINT)").as(s"s_$c")): _*)
    val priorCols = classes.map(c =>
      count(when(col(classCol) === c, 1)).as(s"d_$c")) :+
      count(lit(1)).as("nd")
    val priors = docs.agg(priorCols.head, priorCols.tail: _*)
      .select(classes.map(c => expr(
        s"CAST(floor(ln((CAST(d_$c AS DOUBLE) + 1) / " +
          s"(CAST(nd AS DOUBLE) + ${classes.size})) * 10000) " +
          s"AS BIGINT)").as(s"p_$c")): _*)
    val sumCols = classes.map(c => sum(s"s_$c").as(s"ss_$c"))
    // first class whose total is >= every other's wins (ties break to the
    // earlier class in `classes` — the same contract the oracle's CASE
    // chain implements)
    val pred = classes.zipWithIndex.foldRight(
      lit(classes.last): org.apache.spark.sql.Column) { case ((c, _), e) =>
      val tc = col(s"ss_$c") + col(s"p_$c")
      val ge = classes.map(o => tc >= col(s"ss_$o") + col(s"p_$o"))
        .reduce(_ && _)
      when(ge, lit(c)).otherwise(e)
    }
    tok.join(scores, "w")
      .groupBy(idCol).agg(sumCols.head, sumCols.tail: _*)
      .crossJoin(broadcast(priors))
      .select(col(idCol), pred.as("pred"))
  }

  /** DSIR-style importance weights (Data Selection via Importance
    * Resampling, Xie et al. 2023): per-document log importance
    * ln p_target(doc) − ln p_raw(doc) under two hashed-unigram bag models
    * — the standard pass for re-weighting a raw crawl toward a target
    * distribution (here: a caller-supplied target predicate over the
    * corpus itself, e.g. the English slice).
    *
    * Fully relational and scale-shaped: ONE pass over the exploded tokens
    * builds both bucket count tables simultaneously (conditional
    * aggregate), the `buckets`-row table (fixed size, e.g. 4096) gets its
    * add-1-smoothed log-ratio and is BROADCAST back onto the token
    * stream, and the per-doc score is one hash aggregate. The log-ratio
    * is floored to integer ten-thousandths per bucket BEFORE the per-doc
    * sum, so the sum is exact integer arithmetic — order-independent and
    * bit-portable across engines (docs never carry doubles).
    */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  targetCond: Column, buckets: Int): DataFrame = {
    val tok = docs.select(col(idCol), targetCond.as("__t"),
                          explode(tokens(col(textCol), normalize = true))
                            .as("w"))
    val b = tok.select(col(idCol), col("__t"),
      pmod(org.apache.spark.sql.graft.ColumnBridge.column(
             Md5PrefixLong(org.apache.spark.sql.graft.ColumnBridge
                             .expression(col("w")), 8)),
           lit(buckets.toLong)).as("bk"))
      // feeds both the bucket-count aggregate and the per-doc scoring
      // join — materialize so the corpus-wide tokenize + md5 runs once
      .localCheckpoint()
    val counts = b.groupBy("bk")
      .agg(count(lit(1)).as("c_all"),
           count(when(col("__t"), 1)).as("c_t"))
    val tot = counts.agg(sum("c_all").as("t_all"), sum("c_t").as("t_t"))
    val lr = counts.crossJoin(broadcast(tot))
      .select(col("bk"), expr(
        s"""CAST(floor((ln((CAST(c_t AS DOUBLE) + 1) /
           |              (CAST(t_t AS DOUBLE) + $buckets)) -
           |           ln((CAST(c_all AS DOUBLE) + 1) /
           |              (CAST(t_all AS DOUBLE) + $buckets))) * 10000)
           |     AS BIGINT)""".stripMargin.replaceAll("\n\\s*", " "))
        .as("lr_e4"))
    b.join(broadcast(lr), Seq("bk"))
      .groupBy(idCol)
      .agg(sum("lr_e4").cast("long").as("dsir_e4"),
           count(lit(1)).cast("long").as("n_tokens"))
  }

  /** L2 near-duplicate candidate pairs via MinHash+LSH, verified with exact
    * shingle Jaccard — fully relational formulation:
    *
    *  1. explode distinct shingles (built once per doc);
    *  2. signature = numHashes `min(xxhash64(seed, shingle))` aggregates in
    *     ONE hash-aggregate pass (all native, codegen'd — the earlier
    *     array-of-HOF-folds formulation produced a 400 KB expression tree
    *     that the optimizer inlined into every band hash, 100 s at sf0.1;
    *     this runs the same logical computation in ~2 s);
    *  3. band hashes → explode → self-join on (band, bandHash) for
    *     candidates;
    *  4. exact-Jaccard verify of candidates, also relationally (semi-join
    *     back onto the shingle relation).
    *
    * Shuffle cost: one exchange by doc (signature agg) and one by
    * (band, bandHash) (the candidate join) — each linear in data size;
    * nothing quadratic, nothing driver-side, and NOTHING per candidate
    * pair: verification happens INSIDE the candidate join.
    *
    * Two r14 third-decade root-cause fixes (SURVEY §6.1):
    *
    *  - Cross-band dedup is BY CONSTRUCTION, not by aggregate: a pair
    *    colliding in k of the `bands` bands used to surface k times
    *    into a global `distinct()`. Each bucket row carries the doc's
    *    full band-hash array, and the join emits a pair only from the
    *    FIRST band where it collides ([[firstBandCollision]]) — same
    *    pair set, zero duplicate emissions, no post-join aggregate.
    *  - Verification is IN-JOIN: each bucket row also carries the
    *    doc's sorted shingle-hash array, and exact Jaccard evaluates
    *    on the join output in the same stage via the codegen'd
    *    two-pointer [[SortedIntersectCount]]. The r13 relational
    *    verify (candidates → exchange → ⋈ shingles ⋈ shingles →
    *    count) shipped the FULL candidate set (~4×10⁸ pairs / 8.6 GB
    *    at 100× under this banding — permissive by the recall bound's
    *    design) through a shuffle and blew it up to Σ|A| rows per
    *    candidate (26 GB of spill); in-join verification ships only
    *    the n·bands bucket rows and emits nothing below the
    *    threshold.
    */
  def minhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                          shingleK: Int, numHashes: Int, bands: Int,
                          minJaccard: Double): DataFrame = {
    val rowsPerBand = numHashes / bands
    // single-consumer shingle relation (the signature aggregate) — no
    // materialization needed; shingles ride as 64-bit hashes. Spread
    // before the fan-out: |shingles|×numHashes hash-min updates per doc
    // would otherwise serialize on an under-partitioned narrow input
    // (no-op on real corpora — [[Relational.spread]])
    val sh = Relational.spread(docs).select(
      col(idCol).as("doc"),
      explode(shingles(tokens(col(textCol)), shingleK)).as("s0"))
      .select(col("doc"), xxhash64(col("s0")).as("s"))
    val sigAggs = (0 until numHashes).map { j =>
      min(xxhash64(lit(j), col("s"))).as(s"sig_$j")
    }
    // one aggregate pass: minhash signatures + the doc's sorted
    // shingle-hash set (distinct per doc by construction upstream)
    val sig = sh.groupBy("doc")
      .agg(sort_array(collect_list(col("s"))).as("shs"), sigAggs: _*)
    val bandHashes = (0 until bands).map { i =>
      xxhash64((0 until rowsPerBand)
        .map(r => col(s"sig_${i * rowsPerBand + r}")): _*)
    }
    val buckets = sig
      .select(col("doc"), col("shs"), array(bandHashes: _*).as("bhs"))
      .select(col("doc"), col("shs"),
              posexplode(col("bhs")).as(Seq("band", "bh")), col("bhs"))
    val a = buckets.select(col("doc").as("a"), col("band"), col("bh"),
                           col("bhs").as("abhs"), col("shs").as("ashs"))
    val b = buckets.select(col("doc").as("b"), col("band"), col("bh"),
                           col("bhs").as("bbhs"), col("shs").as("bshs"))
    // No join hint AT ALL (r16; r15 had .hint("merge")): the bucket
    // relation carries full shingle-hash arrays, so a forced
    // per-partition hash build is an OOM cliff once build bytes outgrow
    // partitioncount × executor memory (the r15 ngram 100x single died
    // exactly there). With preferSortMergeJoin (default true) the
    // initial plan is already the spill-safe sort-merge; an explicit
    // SHUFFLE_MERGE hint would additionally VETO AQE's measured
    // maxShuffledHashJoinLocalMapThreshold conversion
    // ([[Relational.AdaptiveHashJoinConf]], set in every harness
    // session) — Spark 4.1's JoinSelection consults the merge hint
    // before the PREFER_SHUFFLE_HASH hint DynamicJoinSelection adds —
    // so hint-free is the one form where AQE re-instates the hash
    // build ONLY when the actual build partitions fit: the fast plan
    // where measured safe, a graceful sort where not.
    // size-ratio prune before the O(|A|+|B|) intersect: inter ≤
    // min(|A|,|B|), so a pair can only reach threshold t when
    // min/(|A|+|B|−min) ≥ t — the same arithmetic shape as the final
    // Jaccard filter, hence lossless by double-division monotonicity
    // (see [[prefixJaccard]]'s positional filter for the argument).
    // Two size() calls against an O(n) intersect: effectively free.
    val mn = least(size(col("ashs")), size(col("bshs")))
    a.join(b, Seq("band", "bh"))
      .filter(col("a") < col("b") &&
              !firstBandCollision(bands, col("band"),
                                  col("abhs"), col("bbhs")) &&
              mn.cast("double") /
                (size(col("ashs")) + size(col("bshs")) - mn)
                >= minJaccard)
      .withColumn("inter",
        Functions.sortedIntersectCountBounded(col("ashs"), col("bshs"),
                                              minJaccard))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("ashs")) + size(col("bshs")) - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** TRUE iff the pair already collided in a band EARLIER than `band`
    * (optionally restricted by `emittedAt`: bit j of the mask says band
    * j's bucket actually emitted — used by the size-probed clustering
    * path where only small buckets emit pairs). Plain element_at/compare
    * OR-chain over the ≤`bands` earlier positions — stays inside
    * whole-stage codegen, which a lambda-HOF formulation would not.
    * `bhs` arrays always carry all `bands` hashes, so element_at is
    * in-range by construction (ANSI-safe). With bands = 1 (one band =
    * the whole signature, rowsPerBand = numHashes — a legal banding)
    * there ARE no earlier bands, so the chain is empty and the result
    * is constant false (Catalyst folds the literal out of the filter).
    */
  private def firstBandCollision(bands: Int, band: Column, abhs: Column,
                                 bbhs: Column,
                                 emittedAt: Option[Column] = None)
      : Column =
    (0 until bands - 1).map { j =>
      val collided = band > j &&
        element_at(abhs, j + 1) === element_at(bbhs, j + 1)
      emittedAt match {
        // same bucket at band j ⇒ same size ⇒ one side's bit suffices
        case Some(mask) =>
          collided && shiftright(mask, j).bitwiseAND(lit(1L)) === 1L
        case None => collided
      }
    }.reduceOption(_ || _).getOrElse(lit(false))

  /** The MinHash machinery behind [[minhashComponents]]: per-doc
    * signature arrays and banded LSH bucket assignment. Returns
    * (arrs = (doc, n_sh, shs), buckets = (doc, band, bh, bhs)) —
    * `shs` is the doc's VALUE-sorted shingle-hash array (feeds the
    * in-join exact verify, [[verifyJaccard]]), `bhs` the doc's FULL
    * band-hash array (bhs[i+1] = band i's hash, 1-based for
    * element_at), carried so candidate joins can dedup cross-band
    * collisions by construction ([[firstBandCollision]]) instead of
    * via a global distinct.
    */
  private def minhashSigRelation(docs: DataFrame, idCol: String,
                                 textCol: String, shingleK: Int,
                                 numHashes: Int, bands: Int)
      : (DataFrame, DataFrame) = {
    val rowsPerBand = numHashes / bands
    // shingles are carried as 64-bit hashes from the explode on: the
    // signature seeds, the candidate join, and the verify arrays all key
    // on 8-byte longs instead of 3-word strings (≈4× smaller shuffles);
    // distinct-ness per doc is established on the strings BEFORE
    // hashing. One consumer (the signature aggregate) ⇒ no
    // materialization needed here: r16 moved the exact verify in-join
    // (sorted arrays on the candidate rows), so the shingle relation is
    // no longer re-read by two verify joins per mining pass — the
    // double corpus re-shuffle the r15 StageProbe condemned on the
    // pairs path. Spread before the fan-out (same rationale as
    // [[minhashNearDupPairs]]; no-op on real corpora).
    val sh = Relational.spread(docs).select(
      col(idCol).as("doc"),
      explode(shingles(tokens(col(textCol)), shingleK)).as("s0"))
      .select(col("doc"), xxhash64(col("s0")).as("s"))
    val sigAggs = (0 until numHashes).map { j =>
      min(xxhash64(lit(j), col("s"))).as(s"sig_$j")
    }
    // per-doc count AND value-sorted shingle-hash array ride along in
    // the signature aggregation — one hash-aggregate pass over the
    // shingle relation feeds the bands, the union term, and the verify.
    // Materialized (r16): the aggregate has TWO consumers (the verify
    // arrs and the band buckets) — unmaterialized, ReusedExchange
    // dedupes the shuffle but the final aggregate (list merge +
    // sort_array + numHashes min-merges per doc) still executes once
    // per consumer, and at 100 TB that is a second full pass over the
    // per-doc signature state; corpus-sized ⇒ bigRel storage.
    val sig = Mat.bigRel(sh.groupBy("doc")
      .agg(count(lit(1)).as("n_sh"),
           sort_array(collect_list(col("s"))).as("shs") +: sigAggs: _*))
    val arrs = sig.select(col("doc"), col("n_sh"), col("shs"))
    val bandHashes = (0 until bands).map { i =>
      xxhash64((0 until rowsPerBand)
        .map(r => col(s"sig_${i * rowsPerBand + r}")): _*)
    }
    val buckets = sig
      .select(col("doc"), array(bandHashes: _*).as("bhs"))
      .select(col("doc"), posexplode(col("bhs")).as(Seq("band", "bh")),
              col("bhs"))
    (arrs, buckets)
  }

  /** Exact-Jaccard verification of candidate (a, b) pairs — the IN-JOIN
    * shape (r16; same as [[minhashNearDupPairs]]' verify): each side
    * joins its (n_sh, value-sorted shingle-hash array) once and the
    * intersect is the native two-pointer
    * [[Functions.sortedIntersectCountBounded]] on the candidate row.
    * Replaces the r15 relational intersection
    * (cand ⋈ shingles ⋈ shingles + groupBy + two count joins), whose
    * first join materializes Σ|A| rows per candidate — the ~20-billion-
    * row / 26 GB-spill intermediate the r14 StageProbe measured on the
    * pairs path — and which re-shuffles the full shingle relation twice
    * per mining pass at 100 TB. Size-ratio prune before the intersect:
    * inter ≤ min(na, nb), so a pair can only reach threshold t when
    * min/(na+nb−min) ≥ t — lossless by the same double-division
    * monotonicity as the final Jaccard filter. Emits only pairs at
    * `jaccard >= minJaccard`, rounded to 4 places; values bit-identical
    * to the relational form (the intersect is exact, the bound only
    * early-exits rows the filter would drop).
    */
  private def verifyJaccard(arrs: DataFrame, cand: DataFrame,
                            minJaccard: Double): DataFrame = {
    val mn = least(col("na"), col("nb"))
    cand
      .join(arrs.select(col("doc").as("a"), col("n_sh").as("na"),
                        col("shs").as("ashs")), "a")
      .join(arrs.select(col("doc").as("b"), col("n_sh").as("nb"),
                        col("shs").as("bshs")), "b")
      .filter(mn.cast("double") / (col("na") + col("nb") - mn)
                >= minJaccard)
      .withColumn("inter",
        Functions.sortedIntersectCountBounded(col("ashs"), col("bshs"),
                                              minJaccard))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** L1→L2 duplicate-class skew guard: collapse EXACT duplicates
    * (bit-identical `textCol` within the same `partCols` block) onto
    * their min-id representative BEFORE near-dup mining. A class of m
    * identical documents — boilerplate pages, the normal shape at
    * 100 TB — otherwise puts m rows into the same LSH band bucket (and
    * fully-overlapping PPJoin prefixes), producing ~m² candidate rows
    * that all verify at J = 1; after the collapse the class costs ONE
    * representative in the mine plus m−1 linear member edges.
    *
    * Returns (reps, memberEdges): `reps` keeps one full input row per
    * distinct (block, text) — the minimum id; `memberEdges` is
    * (a = rep, b = member) for every collapsed non-representative.
    * Each member edge is a J = 1.0 pair by construction (identical
    * text ⇒ identical shingle set, same block ⇒ the pair is in the
    * blocked pair graph), so components over
    * {mined pairs on reps} ∪ memberEdges equal components over the
    * full pair graph EXACTLY — same partition, same per-component
    * minimum (each rep is already its class minimum).
    *
    * Cost: ONE exchange on (block, content hash) per consumer — the
    * representative is `min(id)` over a whole-partition window, not a
    * hash aggregate joined back (the r12 formulation): the agg+join
    * form costs three exchanges and recomputes the doc-derivation
    * subtree on both join sides per consumer, which the r13 bench
    * measured as a ×1.56 `q_pipeline_shard` regression for corpora
    * with no duplicate mass at all. A duplicate class of m rows lands
    * in one window partition — linear min, the same skew cost the
    * aggregate paid.
    */
  private[graft] def exactCollapse(docs: DataFrame, idCol: String,
                                   textCol: String,
                                   partCols: Seq[String])
      : (DataFrame, DataFrame) = {
    val w = Window.partitionBy((partCols :+ "__h").map(col): _*)
    val withRep = docs.withColumn("__h", md5(col(textCol)))
      .withColumn("__rep", min(col(idCol)).over(w))
    val reps = withRep.filter(col(idCol) === col("__rep"))
      .drop("__h", "__rep")
    val memberEdges = withRep.filter(col(idCol) =!= col("__rep"))
      .select(col("__rep").as("a"), col(idCol).as("b"))
    (reps, memberEdges)
  }

  /** L2-at-scale: near-dup CLUSTERING via MinHash LSH with both
    * duplicate-class skew guards — the components-bound counterpart of
    * [[minhashNearDupPairs]] (whose all-pairs contract is inherently
    * quadratic in a duplicate class because the OUTPUT is the m² pair
    * list; callers that only need clusters should take this form).
    *
    *  1. exact duplicates collapse to representatives first
    *     ([[exactCollapse]]) — a 10k-copy boilerplate class never
    *     reaches the LSH join, it contributes 10k−1 linear member
    *     edges;
    *  2. band buckets over the representatives are SIZE-PROBED (one
    *     linear aggregate on (band, bh)): buckets at or under
    *     `bucketCap` emit all intra-bucket pairs (the exact-recall
    *     path — real corpora put near-dup classes of a handful of
    *     docs here); buckets OVER the cap — a near-identical class
    *     whose members share whole signature bands — emit O(m)
    *     representative edges (doc → bucket-min) instead of ~m²
    *     pairs: bucket-star edges preserve the bucket's connectivity
    *     exactly;
    *  3. every candidate edge from either branch is still verified
    *     with exact shingle Jaccard >= `minJaccard` before it enters
    *     the component graph.
    *
    * Returns (node, component = min reachable id) for every doc that
    * has at least one edge (exact-dup members included); singletons
    * are absent, as in [[connectedComponentsStar]].
    */
  def minhashComponents(docs: DataFrame, idCol: String, textCol: String,
                        shingleK: Int, numHashes: Int, bands: Int,
                        minJaccard: Double,
                        bucketCap: Int = 64): DataFrame =
    connectedComponentsStar(
      minhashComponentEdges(docs, idCol, textCol, shingleK, numHashes,
                            bands, minJaccard, bucketCap))

  /** The edge relation behind [[minhashComponents]] — package-visible
    * so the planted-duplicate-class spec can pin the candidate count
    * at O(m), not O(m²).
    */
  private[graft] def minhashComponentEdges(
      docs: DataFrame, idCol: String, textCol: String, shingleK: Int,
      numHashes: Int, bands: Int, minJaccard: Double,
      bucketCap: Int): DataFrame = {
    // the emitted-band mask below is one 64-bit word (bit j = band j
    // emitted); Java's shiftleft/shiftright wrap the shift mod 64, so
    // band j and band j-64 would silently SHARE a bit past 64 bands —
    // a pair could be suppressed at a band that never emitted. 64 bands
    // of a ≤64-hash signature is already the practical ceiling; fail
    // loudly rather than lose candidate pairs.
    require(bands <= 64,
      s"minhashComponents supports at most 64 bands (got $bands): the " +
        "emitted-band dedup mask is a single 64-bit word")
    val (reps, memberEdges) =
      exactCollapse(docs, idCol, textCol, Seq.empty)
    val (arrs, buckets) =
      minhashSigRelation(reps, idCol, textCol, shingleK, numHashes, bands)
    // one linear aggregate sizes every band bucket and picks its min-id
    // root; materialized because the small/star branches read it thrice
    // (buckets-sized ⇒ bigRel storage)
    val sized = Mat.bigRel(buckets.join(
      buckets.groupBy("band", "bh")
        .agg(count(lit(1)).as("m"), min(col("doc")).as("root")),
      Seq("band", "bh")))
    val small = sized.filter(col("m") <= bucketCap)
    // per-doc bitmask of the bands whose bucket EMITS pairs (small), so
    // the cross-band first-collision dedup counts only bands that
    // actually emitted — a pair colliding earlier in an over-cap bucket
    // was never emitted there (it got star edges), so that band must not
    // suppress the pair's first SMALL emission. Same candidate set as
    // the r13 emit-everywhere-then-distinct form, without the global
    // distinct over the duplicate blob.
    val emitMask = sized.groupBy("doc").agg(
      sum(when(col("m") <= bucketCap,
               expr("shiftleft(CAST(1 AS BIGINT), band)"))
        .otherwise(lit(0L))).as("emask"))
    val smallCand = small
      .select(col("doc").as("a"), col("band"), col("bh"),
              col("bhs").as("abhs"))
      .join(emitMask.select(col("doc").as("a"), col("emask")), "a")
      .join(small.select(col("doc").as("b"), col("band"), col("bh"),
                         col("bhs").as("bbhs")),
            Seq("band", "bh"))
      .filter(col("a") < col("b") &&
              !firstBandCollision(bands, col("band"), col("abhs"),
                                  col("bbhs"), Some(col("emask"))))
      .select("a", "b")
    // root = bucket min, so (root, doc) is already a < b oriented
    val starCand = sized
      .filter(col("m") > bucketCap && col("doc") =!= col("root"))
      .select(col("root").as("a"), col("doc").as("b"))
    // the distinct now sees only the deduped small pairs + O(m) star
    // edges (branch overlap + cross-band star repeats), not the blob
    val cand = smallCand.union(starCand).distinct()
    memberEdges.union(
      verifyJaccard(arrs, cand, minJaccard).select("a", "b"))
  }

  /** Exact n-gram Jaccard pairs, COST-BASED between two formulations
    * that provably emit identical rows (LlmSpec pins the equivalence):
    *
    *  - ALL-PAIRS: one shingle self-join + intersection count — fewest
    *    stages, fastest while Σ df² is small, but a boilerplate shingle
    *    shared by N docs costs N² join rows;
    *  - PREFIX-FILTERED (PPJoin; Xiao et al. 2008, "Efficient
    *    Similarity Joins for Near Duplicate Detection"): order shingles
    *    by a GLOBAL total order (df ascending — rarest first — hash
    *    tie-break). If J(A,B) ≥ t then |A∩B| ≥ ⌈t·|A|⌉; the SMALLEST
    *    common shingle has ≥ ⌈t·|A|⌉−1 common shingles above it, so it
    *    sits within A's first |A|−⌈t·|A|⌉+1 shingles — and symmetrically
    *    within B's. Joining only per-doc prefixes therefore loses no
    *    qualifying pair at threshold t, and the exact array-intersect
    *    verify keeps precision exact. The hot shingle sits at the
    *    FREQUENT end of the order and drops out of every prefix — the
    *    N² blow-up becomes ~zero candidates, with NO recall caveat
    *    (a df-cap trades recall; this trades nothing).
    *
    * The dispatch probes the all-pairs cost EXACTLY (Σ df² is the
    * self-join's output row count) and takes the quadratic-safe branch
    * past `selfJoinBudget` — the shape of a cost-based optimizer rule,
    * with the statistic computed, not estimated. `partCol` bounds the
    * pair space (e.g. same-language only).
    */
  /** Exact self-join row-count budget that flips [[ngramJaccardPairs]]
    * from the all-pairs formulation to the prefix-filtered one: the
    * all-pairs shingle self-join materializes exactly Σ_s df(s)² rows
    * over the shared shingles, so the probe measures the REAL cost, not
    * a proxy. ~4M rows is comfortably one shuffle at any executor
    * count; past it the quadratic term is taking over and the prefix
    * path's extra stages amortize.
    */
  val NgramSelfJoinBudget: Long = 1L << 22

  // 256 measured longs — bounded so a session churning corpora can't
  // grow it forever (the [[BoundedMemo]] discipline; same below)
  private val jaccardStatsCache =
    new BoundedMemo[(org.apache.spark.sql.SparkSession, String),
                    java.lang.Long](256)

  /** The shared cost probe behind [[ngramJaccardPairs]] AND
    * [[ngramContainmentPairs]]: the exact row count the all-pairs
    * shingle self-join would produce (Σ df² over shared shingles; df
    * capped at 2²⁰ before squaring so a boilerplate shingle in 10⁹
    * docs can't overflow the sum — any capped value is already orders
    * past every budget). One map-side-combined aggregate + a 1-row
    * job; integers, so the branch choice is deterministic per corpus.
    * MEMOIZED per (session, corpus fingerprint, knobs) — the
    * statistics cache every cost-based optimizer keeps: repeated calls
    * over the same corpus (a pipeline composite, a bench re-run) reuse
    * the measured statistic, the plan-hash component of the
    * fingerprint keeps a filtered/derived corpus on its own entry, and
    * because both entry points build the key identically they SHARE
    * entries. The Spark job runs OUTSIDE the map lock (get → compute →
    * putIfAbsent — a racing duplicate probe is just a second read of
    * the same deterministic integer), so a slow probe never blocks
    * unrelated probes on a ConcurrentHashMap bin.
    */
  private def selfJoinRowStat(docs: DataFrame, sh: DataFrame,
                              idCol: String, textCol: String,
                              partCol: String, shingleK: Int): Long = {
    val spark = docs.sparkSession
    jaccardStatsCache.removeIf(_._1.sparkContext.isStopped)
    val key = (spark, s"$idCol/$textCol/$partCol/$shingleK#" +
      contentFingerprint(docs))
    jaccardStatsCache.getOrElseCompute(key) {
      sh.groupBy("part", "s")
        .agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2)
        .select(least(col("df"), lit(1L << 20)).as("df"))
        .agg(coalesce(sum(col("df") * col("df")), lit(0L)))
        .head().getLong(0)
    }.longValue()
  }

  /** Benchmark decontamination (the GPT-3 Appendix-C / Llama n-gram
    * rule): training documents sharing ANY k-token shingle with an
    * eval/benchmark set are flagged with their distinct-hit count, so
    * the pipeline can drop or audit them before training — the
    * train/test-leakage gate every LLM data pipeline runs. Scale
    * shape: the benchmark is tiny next to the corpus, so its DISTINCT
    * shingle set BROADCASTS and the corpus streams through one hash
    * equi-join keyed on the shingle — no corpus self-join, no shuffle
    * of the corpus text; cost is O(corpus shingles) + the broadcast
    * build. Both sides hash their shingles to 64-bit BEFORE the join
    * (the [[shingleRelation]] discipline): at a real eval-suite size
    * (10⁵ docs × k-gram fan-out) broadcasting raw k-token STRINGS is
    * several× the bytes of the 8-byte hashed form, and the broadcast
    * build is the one driver/executor-memory-bound piece of the plan.
    * xxhash64 is injective on this corpus (pinned by `q_hash_xx`'s
    * collision oracle), so the distinct-hit count is unchanged.
    * (Contrast with [[ngramContainmentPairs]], which mines containment
    * WITHIN one corpus and must self-join.)
    */
  def decontaminate(docs: DataFrame, evalDocs: DataFrame, idCol: String,
                    textCol: String, shingleK: Int): DataFrame = {
    def sh(df: DataFrame) = df.select(
      col(idCol).as("doc"),
      explode(shingles(tokens(col(textCol)), shingleK)).as("s"))
      .select(col("doc"), xxhash64(col("s")).as("sh"))
    // spread only the CORPUS side's fan-out; the eval side is the small
    // broadcast build, where an extra exchange is pure overhead
    sh(Relational.spread(docs))
      .join(broadcast(sh(evalDocs).select("sh").distinct()), "sh")
      .groupBy("doc")
      // count(1) IS the distinct-hit count: [[shingles]] dedups per doc
      // and the broadcast side is distinct, so no joined row repeats
      .agg(count(lit(1)).as("n_hits"))
  }

  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        partCol: String, shingleK: Int, minJaccard: Double,
                        selfJoinBudget: Long = NgramSelfJoinBudget)
      : DataFrame = {
    val sh = shingleRelation(docs, idCol, textCol, partCol, shingleK)
    val selfJoinRows =
      selfJoinRowStat(docs, sh, idCol, textCol, partCol, shingleK)
    if (selfJoinRows <= selfJoinBudget) allPairsJaccard(sh, minJaccard)
    else prefixJaccard(sh, minJaccard)
  }

  /** The PPJoin branch: prefix candidates verified IN-JOIN. The r13
    * shape (prefix self-join → global distinct over the candidate
    * multiset → two id→array joins → interpreted `array_intersect`)
    * never completed a 100× single in two rounds: Σ prefix-df² is
    * ~6×10⁸ occurrences there, and shipping that multiset through a
    * distinct plus joining arrays back spills unboundedly — the same
    * disease the r14 probes root-caused on the minhash path. Here each
    * prefix row carries its doc's (n_sh, VALUE-sorted hash array), the
    * exact Jaccard evaluates on the join output in-stage via the
    * codegen'd [[SortedIntersectCount]], and only SURVIVORS reach the
    * final distinct (a pair sharing k prefix shingles emits k
    * bit-identical (a, b, jaccard) rows — integer intersect count and
    * one rounded division, so the distinct collapses them exactly).
    *
    * POSITIONAL filter (PPJoin's second pruning lever; Xiao et al.
    * 2008 §3.2): the shared shingle sits at 1-based positions
    * (pa, pb) of the two docs' df-ordered arrays. For the occurrence
    * row joined at the pair's FIRST shared shingle (in the global
    * order), every shared shingle lies at-or-after it in BOTH arrays,
    * so |A∩B| ≤ ub = min(n_a − pa, n_b − pb) + 1. Rows are kept only
    * when ub could still reach the threshold — evaluated as
    * `ub / (n_a + n_b − ub) >= t`, the EXACT arithmetic shape of the
    * final Jaccard filter, which double-division monotonicity makes
    * lossless: a qualifying pair's first-shared-shingle row always
    * satisfies it (inter ≤ ub there ⇒ jaccard(ub) ≥ jaccard(inter) ≥
    * t), and one surviving row per pair is all the distinct needs.
    * LATER occurrence rows of the same pair may carry common shingles
    * BEFORE them and get pruned — that is the point: the O(|A|+|B|)
    * intersect runs once per SURVIVING occurrence, not once per
    * shared prefix shingle (the ~87 % compute stage of the r14 100×
    * single). The r14 shape's output is bit-identical.
    */
  private def prefixJaccard(sh: DataFrame,
                            minJaccard: Double): DataFrame =
    prefixOccurrences(sh, minJaccard)
      .filter(col("__survives"))
      // threshold-bounded intersect: identical emitted rows/values (see
      // SortedIntersectCountBounded), ~1/3 fewer merge steps on the
      // dominant non-qualifying candidates
      .withColumn("inter",
        Functions.sortedIntersectCountBounded(col("sa"), col("sb"),
                                              minJaccard))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
      .distinct()

  /** The prefix-candidate join at OCCURRENCE granularity (one row per
    * shared prefix shingle of an a < b pair), with the positional
    * filter's verdict as a `__survives` column instead of applied —
    * [[prefixJaccard]] filters on it; package-visible so the spec and
    * the §6.1 scale probes can pin the prune ratio (occurrences whose
    * intersect is skipped) directly on a real corpus.
    */
  private[graft] def prefixOccurrences(sh: DataFrame,
                                       minJaccard: Double): DataFrame = {
    val arrs = prefixArrays(sh, minJaccard)
    val pre = arrs.select(col("doc"), col("part"), col("n_sh"),
                          col("ssv"), explode(col("prefix")).as("p"))
      .select(col("doc"), col("part"), col("n_sh"), col("ssv"),
              col("p.s").as("s"), col("p.pos").as("pos"))
    val ub = least(col("na") - col("pa"), col("nb") - col("pb")) + lit(1L)
    // no forced shuffle_hash AND no merge hint (r16): both sides are
    // the corpus-sized prefix relation carrying full ssv arrays
    // (~5.4 GB serialized at the 100x corpus), and a FORCED
    // shuffled-hash build of that is a hard per-partition OOM cliff —
    // the r15 100x single died in
    // ShuffledHashJoinExec.buildHashedRelation ("not enough memory to
    // build hash map") exactly where r14's run had squeaked through.
    // Hint-free, the initial plan is SMJ (preferSortMergeJoin default):
    // sorts spill, AQE can split a skewed merge partition, and AQE's
    // measured 64 MB threshold (Relational.AdaptiveHashJoinConf) may
    // re-instate the hash build per-join where the actual build fits —
    // a merge hint would veto that conversion (JoinSelection consults
    // it before DynamicJoinSelection's PREFER_SHUFFLE_HASH).
    pre.select(col("doc").as("a"), col("part"), col("s"),
               col("n_sh").as("na"), col("pos").as("pa"),
               col("ssv").as("sa"))
      .join(pre.select(col("doc").as("b"), col("part"), col("s"),
                       col("n_sh").as("nb"), col("pos").as("pb"),
                       col("ssv").as("sb")),
            Seq("part", "s"))
      .filter(col("a") < col("b"))
      .withColumn("__survives",
        ub.cast("double") / (col("na") + col("nb") - ub) >= minJaccard)
  }

  /** The hashed shingle relation (doc, part, s) both the all-pairs and
    * prefix-filtered paths read: 64-bit-hash the shingle before it hits
    * any exchange, so joins shuffle 8-byte keys instead of 3-word
    * strings (same intersection counts — per-doc distinctness was
    * established on the strings).
    */
  private def shingleRelation(docs: DataFrame, idCol: String,
                              textCol: String, partCol: String,
                              shingleK: Int): DataFrame =
    // spread BEFORE the tokenize+shingle fan-out: a single-row-group
    // (or otherwise under-partitioned narrow) input would run the whole
    // O(total tokens) derivation single-task — no-op on real corpora
    Mat.bigRel(Relational.spread(docs)
      .select(col(idCol).as("doc"), col(partCol).as("part"),
              explode(shingles(tokens(col(textCol)), shingleK)).as("s0"))
      .select(col("doc"), col("part"), xxhash64(col("s0")).as("s")))
      // reused: cost probe + counts + df + prefix/verify consumers;
      // corpus-sized ⇒ bigRel storage

  /** Per-doc (n_sh, full hash array, df-ordered prefix array) — ONE
    * aggregate builds both the verify array and the PPJoin prefix: the
    * (df, s) structs collect per doc and the frequency-ascending sort +
    * prefix slice happen in-CPU inside the row (array_sort), replacing
    * the per-doc ranking window's extra shuffle. df itself must stay a
    * groupBy + join-back (NOT a count-over-window on the shingle key:
    * a boilerplate hash is exactly the hot key such a window would
    * buffer in one task; the aggregate form is AQE-splittable).
    */
  private[graft] def prefixArrays(sh: DataFrame,
                                  minJaccard: Double): DataFrame = {
    // df of SHARED shingles only (df >= 2): a df=1 shingle can never
    // seed a candidate pair, so its exact df is irrelevant — it only
    // has to rank BEFORE every shared shingle (the coalesce below).
    // That makes the rank join's build side |co-occurring shingles|,
    // not |sh| (AQE broadcasts it at harness scale), and lets the
    // prefix drop df=1 entries before the candidate self-join: they
    // consume prefix SLOTS (preserving the lossless bound) but can't
    // match anything, so exploding them would be pure fan-out.
    val dfreq = sh.groupBy("part", "s").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2)
    sh.join(dfreq, Seq("part", "s"), "left")
      .groupBy("doc", "part")
      .agg(collect_list(struct(coalesce(col("df"), lit(1L)).as("df"),
                               col("s"))).as("fs"))
      .withColumn("n_sh", size(col("fs")).cast("long"))
      .withColumn("sorted", array_sort(col("fs")))
      .withColumn("ss", expr("transform(sorted, x -> x.s)"))
      // VALUE-sorted twin of ss for the in-join two-pointer verify
      // ([[SortedIntersectCount]] needs ascending values; ss keeps the
      // df order the prefix bound is stated in)
      .withColumn("ssv", sort_array(expr("transform(sorted, x -> x.s)")))
      // prefix entries carry their 1-based POSITION in the full
      // df-ordered array (position BEFORE the df>=2 filter — the
      // positional bound counts remaining slots in the whole doc), so
      // the candidate join can apply the PPJoin positional filter:
      // at a shared prefix shingle sitting at positions (pa, pb), the
      // overlap from the pair's FIRST shared shingle onward is at most
      // min(n_a - pa, n_b - pb) + 1 (everything common is at-or-after
      // it in BOTH df-ordered arrays)
      .withColumn("prefix", expr(
        s"filter(transform(slice(sorted, 1, " +
        s"CAST(n_sh - ceil($minJaccard * n_sh) + 1 AS INT)), " +
        "(x, i) -> struct(x.s AS s, x.df AS df, " +
        "CAST(i + 1 AS BIGINT) AS pos)), x -> x.df >= 2)"))
      .select(col("doc"), col("part"), col("n_sh"), col("ss"),
              col("ssv"), col("prefix"))
      .localCheckpoint() // read by the candidate join's two sides;
      // per-DOC rows (arrays bound the per-row size) — stays in-memory
      // deserialized: both join sides re-read it immediately
  }

  /** Candidate (a, b) pairs from the per-doc prefix self-join — the
    * lossless PPJoin filter (see [[ngramJaccardPairs]]). Package-
    * visible so the planted-hot-shingle spec can pin the candidate
    * count directly.
    */
  private[graft] def prefixCandidates(arrs: DataFrame): DataFrame = {
    val pre = arrs.select(col("doc"), col("part"),
                          explode(col("prefix")).as("p"))
      .select(col("doc"), col("part"), col("p.s").as("s"))
    pre.select(col("doc").as("a"), col("part"), col("s"))
      .join(pre.select(col("doc").as("b"), col("part"), col("s")),
            Seq("part", "s"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** The all-pairs branch (full shingle self-join) — the DuckDB oracle
    * replicates THIS shape row-for-row; the prefix-filter spec uses it
    * as the equivalence baseline via [[ngramJaccardPairsAllPairs]].
    */
  private def allPairsJaccard(sh: DataFrame,
                              minJaccard: Double): DataFrame = {
    val counts = sh.groupBy("doc").agg(count(lit(1)).as("n_sh"))
    val inter = sh.select(col("doc").as("a"), col("part"), col("s"))
      .join(sh.select(col("doc").as("b"), col("part"), col("s")),
            Seq("part", "s"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(counts.select(col("doc").as("a"), col("n_sh").as("na")), "a")
      .join(counts.select(col("doc").as("b"), col("n_sh").as("nb")), "b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** N-gram CONTAINMENT pairs — the asymmetric sibling of Jaccard:
    * C(A→B) = |A∩B| / |A| finds A quoted/embedded inside a larger B,
    * which symmetric Jaccard misses as soon as |B| ≫ |A| (the union
    * swamps the ratio). A pair is emitted when EITHER direction
    * reaches the threshold, with both ratios reported.
    *
    * Cost-based like [[ngramJaccardPairs]], and it SHARES the memoized
    * Σ df² statistic (same shingle relation, same fingerprint key).
    * The quadratic-safe branch is the ASYMMETRIC prefix filter: only
    * the contained side needs a prefix — C(A→B) ≥ t ⇒ |A∩B| ≥ ⌈t·|A|⌉
    * ⇒ the smallest common shingle sits inside A's
    * (|A|−⌈t·|A|⌉+1)-prefix, while on B's side ANY common shingle is
    * trivially in B's full set — so joining every doc's prefix against
    * the FULL shingle relation is lossless for both directions at
    * once, and a boilerplate shingle (excluded from every prefix)
    * still generates zero candidates.
    */
  def ngramContainmentPairs(docs: DataFrame, idCol: String,
                            textCol: String, partCol: String,
                            shingleK: Int, minContainment: Double,
                            selfJoinBudget: Long = NgramSelfJoinBudget)
      : DataFrame = {
    val sh = shingleRelation(docs, idCol, textCol, partCol, shingleK)
    val selfJoinRows =
      selfJoinRowStat(docs, sh, idCol, textCol, partCol, shingleK)
    if (selfJoinRows <= selfJoinBudget)
      allPairsContainment(sh, minContainment)
    else prefixContainment(sh, minContainment)
  }

  private def allPairsContainment(sh: DataFrame,
                                  minContainment: Double): DataFrame = {
    val counts = sh.groupBy("doc").agg(count(lit(1)).as("n_sh"))
    val inter = sh.select(col("doc").as("a"), col("part"), col("s"))
      .join(sh.select(col("doc").as("b"), col("part"), col("s")),
            Seq("part", "s"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(counts.select(col("doc").as("a"), col("n_sh").as("na")), "a")
      .join(counts.select(col("doc").as("b"), col("n_sh").as("nb")), "b")
      .withColumn("cab", col("inter").cast("double") / col("na"))
      .withColumn("cba", col("inter").cast("double") / col("nb"))
      .filter(col("cab") >= minContainment ||
              col("cba") >= minContainment)
      .select(col("a"), col("b"), round(col("cab"), 4).as("cont_ab"),
              round(col("cba"), 4).as("cont_ba"))
  }

  /** The asymmetric prefix branch: per-doc prefixes (from the SAME
    * [[prefixArrays]] machinery — the ⌈t·n⌉ bound is identical) joined
    * against the full shingle relation, VERIFIED IN-JOIN (the
    * [[prefixJaccard]] r14 shape: both sides carry (n_sh, value-sorted
    * hash array), exact intersect via [[SortedIntersectCount]] in the
    * join stage, duplicates collapse on the bit-identical survivor
    * rows) — no candidate-multiset distinct, no array join-backs.
    */
  private def prefixContainment(sh: DataFrame,
                                minContainment: Double): DataFrame = {
    val arrs = prefixArrays(sh, minContainment)
    // no positional prune here (unlike [[prefixJaccard]]): the full
    // side explodes the VALUE-sorted array, whose positions are not
    // comparable with the prefix side's df-order positions
    val pre = arrs.select(col("doc"), col("part"), col("n_sh"),
                          col("ssv"), explode(col("prefix")).as("p"))
      .select(col("doc"), col("part"), col("n_sh"), col("ssv"),
              col("p.s").as("s"))
    val full = arrs.select(col("doc"), col("part"), col("n_sh"),
                           col("ssv"), explode(col("ssv")).as("s"))
    pre.select(col("doc").as("pa"), col("part"), col("s"),
               col("n_sh").as("npa"), col("ssv").as("spa"))
      // hint-free for the same reason as [[prefixJaccard]]'s candidate
      // join: the full-side explode is even bigger than the prefix side,
      // so a FORCED hash build over it is an OOM cliff at scale; plan
      // SMJ (the default) and let AQE's measured threshold convert
      // per-join — a merge hint here would veto that conversion
      .join(full.select(col("doc").as("pb"), col("part"), col("s"),
                        col("n_sh").as("npb"), col("ssv").as("spb")),
            Seq("part", "s"))
      .filter(col("pa") =!= col("pb"))
      .select(least(col("pa"), col("pb")).as("a"),
              greatest(col("pa"), col("pb")).as("b"),
              when(col("pa") < col("pb"), col("npa"))
                .otherwise(col("npb")).as("na"),
              when(col("pa") < col("pb"), col("npb"))
                .otherwise(col("npa")).as("nb"),
              when(col("pa") < col("pb"), col("spa"))
                .otherwise(col("spb")).as("sa"),
              when(col("pa") < col("pb"), col("spb"))
                .otherwise(col("spa")).as("sb"))
      .withColumn("inter",
        Functions.sortedIntersectCount(col("sa"), col("sb")))
      .withColumn("cab", col("inter").cast("double") / col("na"))
      .withColumn("cba", col("inter").cast("double") / col("nb"))
      .filter(col("cab") >= minContainment ||
              col("cba") >= minContainment)
      .select(col("a"), col("b"), round(col("cab"), 4).as("cont_ab"),
              round(col("cba"), 4).as("cont_ba"))
      .distinct()
  }

  /** Both containment branches force-selected for the equivalence
    * spec (the [[ngramJaccardPairsAllPairs]] pattern).
    */
  private[graft] def ngramContainmentAllPairs(
      docs: DataFrame, idCol: String, textCol: String, partCol: String,
      shingleK: Int, minContainment: Double): DataFrame =
    allPairsContainment(
      shingleRelation(docs, idCol, textCol, partCol, shingleK),
      minContainment)

  private[graft] def ngramContainmentPrefix(
      docs: DataFrame, idCol: String, textCol: String, partCol: String,
      shingleK: Int, minContainment: Double): DataFrame =
    prefixContainment(
      shingleRelation(docs, idCol, textCol, partCol, shingleK),
      minContainment)

  /** Both branches force-selected — the equivalence spec compares them
    * pair-for-pair without depending on what the cost probe picks.
    */
  private[graft] def ngramJaccardPairsAllPairs(
      docs: DataFrame, idCol: String, textCol: String, partCol: String,
      shingleK: Int, minJaccard: Double): DataFrame =
    allPairsJaccard(
      shingleRelation(docs, idCol, textCol, partCol, shingleK), minJaccard)

  private[graft] def ngramJaccardPairsPrefix(
      docs: DataFrame, idCol: String, textCol: String, partCol: String,
      shingleK: Int, minJaccard: Double): DataFrame =
    prefixJaccard(
      shingleRelation(docs, idCol, textCol, partCol, shingleK), minJaccard)

  /** ExactSubstr-style duplicated-span coverage (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better",
    * arXiv:2107.06499): a window position is DUPLICATED when its W-char
    * window occurs anywhere else in the corpus — another document, or
    * another offset of the same document. Per document this returns the
    * count of duplicated positions and the length of the UNION of their
    * [pos, pos+W) intervals: the "how much of this doc is copied text"
    * signal the paper cuts on (their suffix-array finds spans ≥ W; the
    * stride-s shingle form detects every such span, over-counting cover
    * by < W+s at each span boundary — exact at stride 1).
    *
    * Relational plan (what a Spark cluster does well instead of a
    * distributed suffix array): stride-s character shingles (fan-out
    * L/s per doc), occurrences counted by a HASH AGGREGATE on the
    * 64-bit window hash (map-side combine; a boilerplate span shared by
    * N docs costs N rows, never N² pairs), a join back to mark
    * duplicated positions (hot hashes are shuffle-join skew — AQE
    * splittable, which is why this is groupBy+join and NOT a
    * count-over-window that would buffer a hot hash's group in one
    * task), then a per-doc gaps-and-islands window pass for the
    * interval union. At 100 TB: token shingles and stride > 1 shrink
    * the fan-out constant; everything else is the same two hash
    * shuffles + one per-doc window.
    *
    * Collision note: duplication is decided on xxhash64(window); a
    * collision could mark a unique position duplicated (~1e-7 odds at
    * 3M windows). The oracle groups by the window STRING — three-SF
    * agreement is the observed no-collision evidence.
    */
  def exactSubstrCoverage(docs: DataFrame, idCol: String, textCol: String,
                          w: Int, stride: Int = 1): DataFrame = {
    val sh = substrShingles(docs, idCol, textCol, w, stride)
    val occ = sh.groupBy("h").agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") > 1)
    spanCoverage(sh.join(occ, "h").select(col("doc"), col("pos")), w)
  }

  /** Stride-s W-char window hashes of a corpus: (doc, pos, h). */
  private[graft] def substrShingles(docs: DataFrame, idCol: String,
                             textCol: String, w: Int,
                             stride: Int): DataFrame =
    docs
      .filter(length(col(textCol)) >= w)
      .select(col(idCol).as("doc"), col(textCol).as("t"))
      .select(col("doc"), col("t"),
              explode(expr(s"sequence(0, length(t) - $w, $stride)"))
                .as("pos"))
      .select(col("doc"), col("pos"),
              xxhash64(expr(s"substring(t, pos + 1, $w)")).as("h"))

  /** Per-doc interval-union stats over duplicated (doc, pos) window
    * starts: one gaps-and-islands window pass, overlapping AND abutting
    * windows merged into one covered island.
    */
  private[graft] def spanCoverage(dup: DataFrame, w: Int): DataFrame = {
    val byDoc = Window.partitionBy("doc").orderBy("pos")
    dup
      .withColumn("prev_end",
        max(col("pos") + lit(w)).over(
          byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_island",
        when(col("prev_end").isNull || col("prev_end") < col("pos"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(byDoc))
      .groupBy("doc", "island")
      .agg(count(lit(1)).as("n"),
           (max(col("pos")) + lit(w) - min(col("pos"))).as("cover"))
      .groupBy("doc")
      .agg(sum(col("n")).as("n_dup_spans"),
           sum(col("cover")).as("dup_cover_chars"))
  }

  /** Incremental ExactSubstr: score a NEW batch of documents against the
    * accumulated window-hash count store without re-shingling history —
    * the growing-corpus flow, same store discipline as
    * [[minhashIncremental]]. Store contract: parquet (h, n, hb) DELTA
    * rows under `storeDir` — append-only writes, counts aggregated on
    * read, `hb = pmod(h, numBuckets)` hive-partitions the store so the
    * history lookup reads only the batch's touched buckets, and the dir
    * is compacted in-lifecycle once its data-file count passes
    * `compactFileThreshold` (single-writer, the compactor rule).
    *
    * A batch position is DUPLICATED iff its window's TOTAL occurrence
    * count — history plus this batch — exceeds 1: exactly the one-shot
    * corpus-wide rule, so the batch's coverage rows equal the one-shot
    * [[exactSubstrCoverage]] over the full corpus restricted to the
    * batch's docs, and the accumulated store equals the one-shot shingle
    * counts (LlmSpec pins both). Like every incremental dedup, history
    * docs are NOT re-scored when a later batch duplicates them.
    */
  def exactSubstrIncremental(newDocs: DataFrame, idCol: String,
                             textCol: String, storeDir: String, w: Int,
                             stride: Int = 1, numBuckets: Int = 16,
                             compactFileThreshold: Int = 0): DataFrame = {
    val spark = newDocs.sparkSession
    // a crash inside a prior compaction swap may have stranded the
    // complete store under its tmp name — promote/drop before reading
    Sources.recoverCompactedDir(spark, storeDir)
    val sh = substrShingles(newDocs, idCol, textCol, w, stride)
      .localCheckpoint() // reused: batch counts + dup marking
    val batchCounts = sh.groupBy("h").agg(count(lit(1)).as("n"))
      .localCheckpoint() // reused: history join + store append
    val touchedHb = batchCounts
      .select(pmod(col("h"), lit(numBuckets)).cast("int").as("hb"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val storeSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("h",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("hb",
        org.apache.spark.sql.types.IntegerType)))
    val hist =
      (if (touchedHb.isEmpty)
         spark.createDataFrame(
           spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
           storeSchema)
       else
         (try spark.read.parquet(storeDir)
          catch {
            case e: org.apache.spark.sql.AnalysisException
                if e.getCondition == "PATH_NOT_FOUND" ||
                   e.getCondition == "UNABLE_TO_INFER_SCHEMA" =>
              spark.createDataFrame(
                spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                storeSchema)
          }).filter(col("hb").isin(touchedHb: _*))) // partition-pruned
        .groupBy("h").agg(sum(col("n")).as("n_hist"))
    val dupHashes = batchCounts.join(hist, Seq("h"), "left")
      .filter(coalesce(col("n_hist"), lit(0L)) + col("n") > 1)
      .select("h")
    val out =
      spanCoverage(sh.join(dupHashes, "h").select(col("doc"), col("pos")), w)
        .localCheckpoint() // materialize BEFORE the append mutates the store
    batchCounts
      .withColumn("hb", pmod(col("h"), lit(numBuckets)).cast("int"))
      .write.mode("append").partitionBy("hb").parquet(storeDir)
    if (compactFileThreshold > 0 &&
        Sources.dataFileCount(spark, storeDir) > compactFileThreshold)
      Sources.compactPartitionedDir(spark, storeDir, "hb")
    out
  }

  /** C4/RefinedWeb-style dedup REWRITE: the corpus with duplicated
    * chunk units REMOVED, keeping each chunk's corpus-wide FIRST
    * occurrence (smallest (doc, pos)). Where [[exactSubstrCoverage]]
    * and q_dedup_chunks only SCORE duplication, this emits the cleaned
    * text — the pass that actually shrinks a crawl.
    *
    * Relational plan: position-indexed fixed-size token chunks
    * (INCLUDING the trailing partial — a rewrite must preserve tails,
    * unlike the scoring form's chunksOf), first occurrence per chunk by
    * min over an integer (doc·10⁶ + pos) order key — ONE hash
    * aggregate, map-side combinable, never a per-chunk window (a
    * boilerplate chunk shared by 10⁶ docs is a hot aggregation KEY, not
    * a hot window partition) — then a join-back keeps instances equal
    * to their chunk's minimum and a per-doc sorted collect reassembles
    * the surviving text (buffer bounded by the doc's own chunk count).
    */
  def chunkDedupRewrite(docs: DataFrame, idCol: String, textCol: String,
                        chunkTokens: Int): DataFrame = {
    val k = chunkTokens
    val inst = docs
      .select(col(idCol).as("doc"), tokens(col(textCol)).as("t"))
      .select(col("doc"), posexplode(expr(
        s"transform(sequence(0, cast(ceil(size(t) / $k.0) as int) - 1), " +
        s"i -> array_join(slice(t, i * $k + 1, $k), ' '))")))
      .withColumnRenamed("pos", "pos")
      .withColumnRenamed("col", "chunk")
      .withColumn("ok", col("doc") * lit(1000000L) + col("pos"))
    val firsts = inst.groupBy("chunk").agg(min(col("ok")).as("fk"))
    val kept = inst.join(firsts, "chunk").filter(col("ok") === col("fk"))
    val reassembled = kept.groupBy("doc")
      .agg(count(lit(1)).as("n_kept"),
           array_join(transform(
             array_sort(collect_list(struct(col("pos"), col("chunk")))),
             s => s.getField("chunk")), " ").as("clean_text"))
    inst.groupBy("doc").agg(count(lit(1)).as("n_chunks"))
      .join(reassembled, Seq("doc"), "left")
      .select(col("doc"), col("n_chunks"),
              coalesce(col("n_kept"), lit(0L)).as("n_kept"),
              coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Incremental MinHash-LSH near-dup: match a NEW batch of documents
    * against the accumulated corpus without recomputing history — the
    * production flow for a growing corpus (today's shard vs years of
    * data). A persistent store holds, for every indexed doc,
    *
    *  - its LSH band keys `(band, bh)`, hive-partitioned by
    *    `bhb = pmod(bh, numBuckets)` — the batch's band keys
    *    partition-prune the candidate lookup;
    *  - its shingle hashes `(doc, s)`, hive-partitioned by
    *    `docb = pmod(doc, numBuckets)` — candidate docs partition-prune
    *    the verification reads.
    *
    * Per batch: signature pass over the batch only → candidates =
    * batch-vs-history (pruned store join) ∪ batch-vs-batch → exact
    * Jaccard verify (batch shingles + pruned history shingles) → append
    * the batch's own band keys and shingles (append-only, no rewrite).
    * Cost scales with batch size × collision rate, never with corpus
    * size. Returns verified pairs (a = new doc, b = matched doc, both
    * orientations batch-vs-history; a < b within the batch).
    *
    * `compactFileThreshold` > 0 makes store hygiene part of the
    * lifecycle: when either store's data-file count exceeds the
    * threshold after a batch's appends, that store is rewritten to one
    * file per hive bucket ([[Sources.compactPartitionedDir]]) —
    * append-only stays cheap per batch without the file count (and with
    * it the pruned lookup's listing/scheduling cost) growing without
    * bound over O(10⁴) batches. Caller must not index concurrently
    * (single-writer, same rule as any compactor).
    */
  def minhashIncremental(newDocs: DataFrame, idCol: String, textCol: String,
                         storeDir: String, shingleK: Int, numHashes: Int,
                         bands: Int, minJaccard: Double,
                         numBuckets: Int = 16,
                         compactFileThreshold: Int = 0): DataFrame = {
    val spark = newDocs.sparkSession
    val rowsPerBand = numHashes / bands
    def emptyStore(schema: org.apache.spark.sql.types.StructType) =
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                            schema)
    def readStore(path: String,
                  schema: org.apache.spark.sql.types.StructType) = {
      // promote/drop a stranded compaction tmp BEFORE the read — the
      // PATH_NOT_FOUND fallback below would otherwise misread a
      // mid-swap crash as "no history yet" and silently reset the store
      Sources.recoverCompactedDir(spark, path)
      try spark.read.parquet(path)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "PATH_NOT_FOUND" ||
               e.getCondition == "UNABLE_TO_INFER_SCHEMA" =>
          emptyStore(schema)
      }
    }
    // batch-local shingles + signatures (same shapes as the batch form)
    val sh = newDocs.select(
      col(idCol).as("doc"),
      explode(shingles(tokens(col(textCol)), shingleK)).as("s0"))
      .select(col("doc"), xxhash64(col("s0")).as("s"))
      .localCheckpoint()
    val sigAggs = (0 until numHashes).map { j =>
      min(xxhash64(lit(j), col("s"))).as(s"sig_$j")
    }
    val sig = sh.groupBy("doc").agg(count(lit(1)).as("n_sh"), sigAggs: _*)
    val bandStructs = (0 until bands).map { i =>
      struct(lit(i).as("band"),
             xxhash64((0 until rowsPerBand)
               .map(r => col(s"sig_${i * rowsPerBand + r}")): _*).as("bh"))
    }
    val batchKeys = sig
      .select(col("doc"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc"), col("bb.band").as("band"), col("bb.bh").as("bh"))
      .withColumn("bhb", pmod(col("bh"), lit(numBuckets)).cast("int"))
      .localCheckpoint()
    val touchedBhb = batchKeys.select("bhb").distinct()
      .collect().map(_.getInt(0)).toSeq
    val keySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("band",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("bh",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("bhb",
        org.apache.spark.sql.types.IntegerType)))
    val histKeys = readStore(s"$storeDir/bands", keySchema)
      .filter(col("bhb").isin(touchedBhb: _*)) // partition-pruned
    // candidates: new-vs-history (both orientations kept distinct by
    // construction: a is always the new doc) ∪ new-vs-new (a < b)
    val candHist = batchKeys.select(col("doc").as("a"), col("band"), col("bh"))
      .join(histKeys.select(col("doc").as("b"), col("band"), col("bh")),
            Seq("band", "bh"))
      .filter(col("a") =!= col("b"))
    val candNew = batchKeys.select(col("doc").as("a"), col("band"), col("bh"))
      .join(batchKeys.select(col("doc").as("b"), col("band"), col("bh")),
            Seq("band", "bh"))
      .filter(col("a") < col("b"))
    val cand = candHist.select("a", "b").union(candNew.select("a", "b"))
      .distinct().localCheckpoint()
    // verification shingles: the batch's own + the candidates' history
    // docs (doc-bucket partition-pruned read)
    val candDocsB = cand.select(col("b").as("doc")).distinct()
    val touchedDocb = candDocsB
      .select(pmod(col("doc"), lit(numBuckets)).cast("int").as("docb"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val shSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("docb",
        org.apache.spark.sql.types.IntegerType)))
    val histSh =
      (if (touchedDocb.isEmpty) emptyStore(shSchema)
       else readStore(s"$storeDir/shingles", shSchema)
         .filter(col("docb").isin(touchedDocb: _*)))
        .join(candDocsB, "doc") // only candidates' shingles
        .select("doc", "s")
    val allSh = sh.union(histSh).localCheckpoint()
    val counts = allSh.groupBy("doc").agg(count(lit(1)).as("n_sh"))
    val inter = cand
      .join(allSh.select(col("doc").as("a"), col("s")), "a")
      .join(allSh.select(col("doc").as("b"), col("s")), Seq("b", "s"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    val pairs = inter
      .join(counts.select(col("doc").as("a"), col("n_sh").as("na")), "a")
      .join(counts.select(col("doc").as("b"), col("n_sh").as("nb")), "b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
      .localCheckpoint() // materialize BEFORE the appends change the store
    // index the batch (append-only; new shards never rewrite history)
    batchKeys.write.mode("append").partitionBy("bhb")
      .parquet(s"$storeDir/bands")
    sh.withColumn("docb", pmod(col("doc"), lit(numBuckets)).cast("int"))
      .write.mode("append").partitionBy("docb")
      .parquet(s"$storeDir/shingles")
    if (compactFileThreshold > 0) {
      if (Sources.dataFileCount(spark, s"$storeDir/bands")
            > compactFileThreshold)
        Sources.compactPartitionedDir(spark, s"$storeDir/bands", "bhb")
      if (Sources.dataFileCount(spark, s"$storeDir/shingles")
            > compactFileThreshold)
        Sources.compactPartitionedDir(spark, s"$storeDir/shingles", "docb")
    }
    pairs
  }

  /** 60-bit SimHash, relationally: explode tokens, hash each once, then 60
    * native `sum` aggregates (one per bit: ±1 by that bit of the token
    * hash) in a single hash-aggregate pass; bit k of the result is set
    * when its sum is positive.
    *
    * 60 bits (15 md5 hex digits) rather than 64: the md5-prefix hash is
    * the repo's PORTABLE hash idiom ([[Tables.partsupp]]), so a SQL
    * oracle reproduces the signature — and with it the whole near-dup
    * pair list — bit-for-bit, where the previous xxhash64 form was
    * Spark-only and left q_dedup_simhash rows-only-checkable. 15 hex
    * digits keep every intermediate strictly below 2^60, inside BIGINT
    * range in both engines with no sign games.
    */
  val simhashBits = 60

  def simhash60(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // spread before the token fan-out + 60 per-token bit aggregates
    // (no-op on real corpora — [[Relational.spread]])
    val th = Relational.spread(docs)
      .select(col(idCol).as("doc"),
              explode(tokens(col(textCol))).as("t"))
      // native md5-prefix (r16): same digest, no hex round-trip — see
      // [[Md5PrefixLong]]
      .withColumn("h",
        org.apache.spark.sql.graft.ColumnBridge.column(
          Md5PrefixLong(org.apache.spark.sql.graft.ColumnBridge
                          .expression(col("t")), 15)))
    val bitAggs = (0 until simhashBits).map { k =>
      sum(shiftright(col("h"), k).bitwiseAND(lit(1L)) * 2 - 1).as(s"c_$k")
    }
    th.groupBy("doc").agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("doc"),
              (0 until simhashBits).map { k =>
                when(col(s"c_$k") > 0, shiftleft(lit(1L), k)).otherwise(lit(0L))
              }.reduce(_ bitwiseOR _).as("simhash"))
  }

  /** SimHash near-dup pairs: band the 60-bit hash into 4×15-bit keys
    * (a pair within Hamming distance 3 must agree on ≥1 band), then filter
    * candidates by exact Hamming distance.
    */
  def simhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                          maxHamming: Int): DataFrame = {
    val hashed = simhash60(docs, idCol, textCol)
      .withColumn("bands", array((0 until 4).map { i =>
        shiftright(col("simhash"), i * 15).bitwiseAND(lit(0x7FFFL))
      }: _*))
      .select(col("doc"), col("simhash"),
              posexplode(col("bands")).as(Seq("band", "bk")))
      // 4 narrow rows per doc, read by BOTH pair-join sides: without
      // the checkpoint each side re-runs the whole tokenize+md5+60-agg
      // signature pass (and its serial single-row-group scan) from
      // scratch
      .localCheckpoint()
    val a = hashed.select(col("doc").as("a"), col("simhash").as("ha"),
                          col("band"), col("bk"))
    val b = hashed.select(col("doc").as("b"), col("simhash").as("hb"),
                          col("band"), col("bk"))
    a.join(b, Seq("band", "bk"))
      .filter(col("a") < col("b"))
      // Hamming filter BEFORE the dedup shuffle: the bit op is a
      // per-row codegen'd expression, so the distinct only pays for
      // surviving pairs (~3x fewer rows at sf0.1); a multi-band dup
      // carries identical (ha, hb) on every copy, so filtering first
      // cannot change the deduped set
      .withColumn("hamming",
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("a", "b", "hamming").dropDuplicates("a", "b")
  }

  /** Brute-force cosine top-k against a single query vector (broadcast).
    * The scale path replaces the global sort with per-partition top-k; at
    * harness sizes TakeOrderedAndProject already does exactly that.
    */
  def cosineTopK(embeddings: DataFrame, query: DataFrame, k: Int): DataFrame =
    embeddings.crossJoin(broadcast(query))
      .withColumn("sim_raw", Functions.cosine(col("embedding"), col("q_emb")))
      .orderBy(col("sim_raw").desc_nulls_last, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("sim_raw"), 4).as("sim"))

  /** ±1 hyperplane coefficient for (plane, dimension) — the low bit of
    * the PORTABLE md5-prefix hash of "p_i" (the [[Tables.partsupp]]
    * idiom), computed DRIVER-SIDE with MessageDigest: byte-identical to
    * Spark's and DuckDB's md5 of the same string, so the plan embeds
    * the coefficients as literals while a SQL oracle re-derives them
    * from the formula.
    */
  private def md5Sign(p: Int, i: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${p}_$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 8), 16) % 2).toInt * 2 - 1
  }

  /** Deterministic random-hyperplane bucket id (numPlanes sign bits) for
    * LSH-bucketed ANN. Plane p's coefficients are the [[md5Sign]] ±1
    * values — no stored/fitted model, identical on any cluster, and
    * reproducible by a SQL engine from the md5 formula alone. The
    * coefficient vectors are CONSTANT, so they're hoisted into array
    * literals at plan build and each projection is one native codegen'd
    * [[DotProduct]] (deterministic left-to-right accumulation — the
    * same fold order the cosine oracle idiom mirrors) instead of an
    * interpreted per-element HOF fold with a hash per element
    * (0.9 s → 0.3 s for q_simsearch_lsh at sf0.1). Float literals to
    * match the float embedding arrays; ±1 is exact in either width.
    */
  def hyperplaneBucket(vec: Column, numPlanes: Int, dim: Int = 64): Column =
    (0 until numPlanes).map { p =>
      val coeffs = array((0 until dim).map(i =>
        lit(md5Sign(p, i).toFloat)): _*)
      when(Functions.dotProduct(vec, coeffs) > 0, shiftleft(lit(1L), p))
        .otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)

  /** LSH-bucketed ANN: restrict the scan to the query's hyperplane bucket,
    * then exact cosine top-k within it. At 100 TB the bucket column is a
    * partition key — the query touches 1/2^planes of the data.
    */
  def annLshTopK(embeddings: DataFrame, query: DataFrame, numPlanes: Int,
                 k: Int): DataFrame = {
    val bucketed = embeddings
      .withColumn("bucket", hyperplaneBucket(col("embedding"), numPlanes))
    val qb = query
      .select(hyperplaneBucket(col("q_emb"), numPlanes).as("q_bucket"))
    val inBucket = bucketed
      .join(broadcast(qb), col("bucket") === col("q_bucket"), "left_semi")
      .drop("bucket")
    cosineTopK(inBucket, query, k)
  }

  /** Blocked fuzzy-match pairs: Levenshtein distance computed only on
    * candidate pairs from a real blocking stage — (a) the pair shares at
    * least one RARE shingle (document frequency ≤ maxDf), and (b) the
    * docs' lengths differ by ≤ lenTol chars (edit distance is lower-bounded
    * by the length difference, so distant-length pairs can't be close).
    * The O(len²) Levenshtein then runs on the first `prefixLen` chars of
    * the surviving pairs only.
    *
    * Scale shape: pair count is bounded by Σ_rare-shingles df² ≤
    * maxDf · |shingle occurrences| — linear in corpus size for fixed
    * maxDf, never the O(n²) pair space. All stages are explode +
    * hash-aggregate + equi-join.
    */
  def editDistancePairs(docs: DataFrame, idCol: String, textCol: String,
                        shingleK: Int, maxDf: Int, lenTol: Int,
                        prefixLen: Int): DataFrame = {
    val base = docs.select(col(idCol).as("doc"),
                           length(col(textCol)).as("len"),
                           substring(col(textCol), 1, prefixLen).as("p"))
      .localCheckpoint() // reused by both sides of the verify join
    val sh = docs.select(col(idCol).as("doc"),
                         explode(shingles(tokens(col(textCol)), shingleK))
                           .as("s0"))
      .select(col("doc"), xxhash64(col("s0")).as("s"))
    // shingles are distinct per doc, so count(*) per shingle = doc freq
    val rare = sh.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select("s")
    val rareSh = sh.join(rare, "s")
    val cand = rareSh.select(col("doc").as("a"), col("s"))
      .join(rareSh.select(col("doc").as("b"), col("s")), "s")
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    cand
      .join(base.select(col("doc").as("a"), col("p").as("pa"),
                        col("len").as("la")), "a")
      .join(base.select(col("doc").as("b"), col("p").as("pb"),
                        col("len").as("lb")), "b")
      .filter(abs(col("la") - col("lb")) <= lenTol)
      .select(col("a"), col("b"),
              levenshtein(col("pa"), col("pb")).cast("long").as("dist"))
  }

  /** Banded hyperplane-LSH near-duplicate pairs over an embedding column —
    * the production-scale replacement for the exact all-pairs cosine join
    * (which stays as the recall oracle). Shape:
    *
    *  1. ONE posexplode + ONE hash-aggregate computes every plane
    *     projection: plane p's coefficient for dimension i is ±1 derived
    *     from xxhash64(p, i) (same stored-model-free derivation as
    *     [[hyperplaneBucket]], but formulated relationally so the
    *     tables×bits sums are codegen'd native aggregates instead of
    *     interpreted HOF folds);
    *  2. the sign bits band into `tables` keys of `bitsPerTable` bits;
    *     a pair is a candidate iff it agrees on ≥1 full band
    *     (sim s → per-plane agreement 1-acos(s)/π, so at s=0.5 a
    *     16-table × 3-bit banding misses with prob (1-(2/3)³)¹⁶ ≈ 0.4 %);
    *  3. candidates come from a self-equi-join on (table, bandKey) —
    *     shuffle cost is Σ bucket² per table, linear in collisions, never
    *     the O(n²) pair space;
    *  4. exact-cosine verify with the same [[Functions.dotProduct]]
    *     arithmetic as the baseline, so surviving pairs are bit-identical
    *     to what the all-pairs join would emit.
    *
    * At 100 TB, `bitsPerTable` is the scale knob: bucket count 2^bits per
    * table should track log₂(n / target-bucket-size) so per-bucket pair
    * counts stay bounded; the harness default (3 bits over ~10³ vectors)
    * keeps buckets ~n/8.
    */
  def embedNearDupPairsBucketed(embeddings: DataFrame, idCol: String,
                                vecCol: String, tables: Int,
                                bitsPerTable: Int,
                                minSim: Double): DataFrame = {
    val numPlanes = tables * bitsPerTable
    // One xxhash64 per element per 64-plane BLOCK (projected once per row,
    // before the aggregate), with each plane's ±1 sign read as a bit of
    // that hash — versus hashing per (plane, element), this cuts the
    // signature stage's hash work by ~min(numPlanes, 64)×. Signs stay iid
    // uniform (xxhash64 bits), so LSH quality is unchanged.
    val blocks = (numPlanes + 63) / 64
    val comps = (0 until blocks).foldLeft(
        embeddings.select(col(idCol).as("vid"),
                          posexplode(col(vecCol)).as(Seq("i", "x")))) {
      (df, b) => df.withColumn(s"h_$b", xxhash64(lit(b), col("i")))
    }
    val projAggs = (0 until numPlanes).map { p =>
      val sign = shiftright(col(s"h_${p / 64}"), p % 64)
        .bitwiseAND(lit(1L)).cast("double") * 2 - 1
      sum(col("x").cast("double") * sign).as(s"proj_$p")
    }
    val proj = comps.groupBy("vid").agg(projAggs.head, projAggs.tail: _*)
    val tableKeys = (0 until tables).map { t =>
      struct(lit(t).as("tbl"),
             (0 until bitsPerTable).map { j =>
               when(col(s"proj_${t * bitsPerTable + j}") > 0,
                    shiftleft(lit(1L), j)).otherwise(lit(0L))
             }.reduce(_ bitwiseOR _).as("bk"))
    }
    val keys = proj
      .select(col("vid"), explode(array(tableKeys: _*)).as("kk"))
      .select(col("vid"), col("kk.tbl").as("tbl"), col("kk.bk").as("bk"))
    // Verify INSIDE the bucket join: each side carries its vector + norm,
    // the exact cosine evaluates on the join output in the same stage,
    // and only SURVIVORS reach the distinct. The r13 shape
    // (candidates → global distinct → two id→vector joins → verify)
    // shuffled the whole candidate multiset three times — the r14
    // third-decade probe measured exactly that aggregate+join tail as
    // the super-linear stages at 100×. Duplicate emissions across tables
    // produce bit-identical (a, b, sim) rows (same deterministic
    // [[DotProduct]] fold), so the post-filter distinct returns the
    // identical pair set. n·tables bucket rows × (vec 256 B) is the only
    // shuffle that grows with the corpus — linear by the self-tuning
    // bucket-width contract.
    val v = embeddings.select(col(idCol).as("vid"), col(vecCol).as("v"),
                              Functions.l2Norm(col(vecCol)).as("nrm"))
    val kv = keys.join(v, "vid")
    kv.select(col("vid").as("a"), col("tbl"), col("bk"),
              col("v").as("ea"), col("nrm").as("na"))
      .join(kv.select(col("vid").as("b"), col("tbl"), col("bk"),
                      col("v").as("eb"), col("nrm").as("nb")),
            Seq("tbl", "bk"))
      .filter(col("a") < col("b"))
      .withColumn("sim_raw",
        Functions.dotProduct(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("sim_raw") >= minSim)
      .select(col("a"), col("b"), round(col("sim_raw"), 4).as("sim"))
      .distinct()
  }

  /** [[embedNearDupPairsBucketed]] with the bucket width chosen from the
    * corpus size: bitsPerTable = log₂(n / targetBucketRows), so expected
    * bucket occupancy stays ≈ targetBucketRows and candidate-pair cost
    * (Σ bucket² per table) stays linear as n grows — the self-tuning form
    * of the "bits is the scale knob" contract. Costs one count() of the
    * embedding table (a metadata-only scan for parquet).
    */
  def embedNearDupPairsAuto(embeddings: DataFrame, idCol: String,
                            vecCol: String, tables: Int,
                            targetBucketRows: Int,
                            minSim: Double): DataFrame = {
    val n = embeddings.count()
    val bits = math.max(2,
      math.ceil(math.log(math.max(1.0, n.toDouble / targetBucketRows))
                  / math.log(2)).toInt)
    embedNearDupPairsBucketed(embeddings, idCol, vecCol, tables, bits, minSim)
  }

  /** Multi-probe LSH ANN: probe the query's hyperplane bucket PLUS every
    * bucket within Hamming distance `radius` (≤ radius sign bits
    * flipped). A near neighbor that lands across one or two hyperplanes
    * from the query — the dominant miss mode of single-probe LSH — is
    * recovered; recall is monotone in `radius` while the scan fraction is
    * C(numPlanes, ≤radius)/2^numPlanes. The probe list is a broadcast of
    * bounded size; the data side still computes its bucket once and
    * semi-joins, so radius trades recall for scan WITHOUT re-hashing or
    * extra tables.
    */
  def annLshMultiProbeTopK(embeddings: DataFrame, query: DataFrame,
                           numPlanes: Int, k: Int,
                           radius: Int = 1): DataFrame = {
    val bucketed = embeddings
      .withColumn("bucket", hyperplaneBucket(col("embedding"), numPlanes))
    val masks: Seq[Long] = (0 to radius).flatMap(r =>
      (0 until numPlanes).combinations(r)
        .map(_.foldLeft(0L)((m, p) => m | (1L << p))))
    val probes = query
      .select(hyperplaneBucket(col("q_emb"), numPlanes).as("qb"))
      .select(explode(array(masks.map(m => col("qb").bitwiseXOR(lit(m))): _*))
                .as("q_bucket"))
      .distinct()
    val inBuckets = bucketed
      .join(broadcast(probes), col("bucket") === col("q_bucket"), "left_semi")
      .drop("bucket")
    cosineTopK(inBuckets, query, k)
  }

  /** Resolve near-dup pairs into duplicate clusters: iterative min-label
    * propagation (the GraphFrames-style connected-components loop — a
    * driver-side loop of ~diameter iterations, each a distributed
    * join+aggregate; lineage cut per iteration with localCheckpoint).
    * Returns (node, component) with component = min doc id in the cluster
    * — the canonical survivor a dedup pass keeps.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // materialize once — every iteration joins against the edge set, and
    // without the checkpoint each pass would recompute the (expensive)
    // upstream pair-mining lineage
    val edges = pairs.select(col("a"), col("b"))
      .union(pairs.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint()
    // seed with least(node, min neighbor) — the same aggregation that
    // derives the node set performs the first propagation step for free
    var labels = edges.groupBy(col("a").as("node"))
      .agg(min(col("b")).as("nmin"))
      .select(col("node"), least(col("node"), col("nmin")).as("label"))
      .localCheckpoint()
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val neighborMin = edges
        .join(labels, edges("b") === labels("node"))
        .groupBy(edges("a").as("nbr_node"))
        .agg(min("label").as("nmin"))
      val updated = labels
        .join(neighborMin, labels("node") === neighborMin("nbr_node"), "left")
        .select(col("node"), col("label"),
                least(col("label"), coalesce(col("nmin"), col("label")))
                  .as("next_label"))
        .localCheckpoint()
      changed = updated.filter(col("next_label") < col("label")).count()
      labels = updated.select(col("node"), col("next_label").as("label"))
      i += 1
    }
    // plain label propagation needs O(graph diameter) rounds; returning
    // partially-converged labels would silently split components, so
    // refuse instead and point at the round-bounded algorithm
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter rounds " +
        "(graph diameter exceeds the round budget); raise maxIter or use " +
        "connectedComponentsStar, which converges in O(log^2 n) rounds")
    labels.select(col("node"), col("label").as("component"))
  }

  /** Connected components via alternating large-star / small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — the round-bounded production algorithm: O(log² n) rounds
    * regardless of graph diameter, where min-label propagation
    * ([[connectedComponents]]) needs O(diameter) rounds and dies on long
    * chains. Each round is two hash-aggregate + equi-join passes, fully
    * distributed, lineage cut per round with localCheckpoint.
    *
    *  - large-star(u): every neighbor v > u re-attaches to
    *    m = min(N(u) ∪ u) — halves long chains;
    *  - small-star(u): u and its smaller neighbors collapse onto their
    *    minimum — forms stars.
    *
    * Converges when the canonical (big → small) edge set is stable; the
    * final edges point every non-root node at its component minimum.
    * Same output contract as [[connectedComponents]]: (node, component =
    * min id), nodes appearing in `pairs` only.
    */
  def connectedComponentsStar(pairs: DataFrame, maxIter: Int = 30): DataFrame = {
    // materialize the PAIR LIST first: edges and nodes below are two
    // separate actions, and without this cut each would re-execute the
    // full upstream mining lineage (r14 finding: the 100× components
    // run paid the candidate join twice and carried both executions'
    // shuffle files simultaneously — 2× compute AND 2× scratch). The
    // pair list itself is small (the mining's verified OUTPUT).
    val p0 = pairs.select(col("a"), col("b")).localCheckpoint()
    // canonical orientation u > v, no self-loops
    var edges = p0
      .select(greatest(col("a"), col("b")).as("u"),
              least(col("a"), col("b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    val nodes = p0.select(col("a").as("node"))
      .union(p0.select(col("b").as("node")))
      .distinct()
      .localCheckpoint()
    def fingerprint(e: DataFrame): (Long, Long, Long) = {
      // set identity = (count, two independent xor-folded hashes): xor is
      // order-independent and can't overflow under ANSI arithmetic
      val r = e.agg(count(lit(1)),
                    coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)),
                    coalesce(bit_xor(xxhash64(col("v"), col("u"))), lit(0L)))
        .head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    var fp = fingerprint(edges)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // large-star over the SYMMETRIC neighborhood
      val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val minsL = sym.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      val afterLarge = sym.join(minsL, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
      // small-star on the canonical big → small edges
      val minsS = afterLarge.groupBy("u").agg(min("v").as("m"))
      val afterSmall = afterLarge.join(minsS, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(minsS.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint()
      val fpNext = fingerprint(afterSmall)
      converged = fpNext == fp
      fp = fpNext
      edges = afterSmall
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge within $maxIter rounds")
    nodes.join(edges, nodes("node") === edges("u"), "left")
      .select(col("node"), coalesce(col("v"), col("node")).as("component"))
  }

  /** Merge a batch's newly-mined duplicate pairs into a PERSISTED
    * component label table WITHOUT recomputing history — the
    * incremental counterpart of [[connectedComponentsStar]], closing
    * the loop that [[minhashIncremental]] opens: the store mines new
    * pairs against history, and this folds them into the standing
    * cluster map (union of components, by representative).
    *
    * Mechanics: each new pair's endpoints map onto their CURRENT
    * representatives (left join against the stored labels — an
    * unlabeled endpoint represents itself), the star contraction runs
    * over that REPRESENTATIVE graph — O(new pairs + touched
    * components) work, never O(history) — and the stored table then
    * remaps only the components the batch touched. Component ids stay
    * the component-minimum node id: every old root is its component's
    * minimum, so the minimum over connected roots (what the star
    * contraction yields) IS the minimum over the merged node set. That
    * invariant makes the incremental result BIT-IDENTICAL to a
    * from-scratch run over the concatenated pair set — the driver key
    * `q_dedup_components_incr` pins the hash match against the
    * one-shot oracle, and LlmSpec folds a 3-batch chain.
    *
    * Returns the updated label table: all stored nodes plus every new
    * pair endpoint (the same "nodes that ever appeared in pairs"
    * contract the one-shot form has).
    */
  def mergeComponentLabels(storedLabels: DataFrame,
                           newPairs: DataFrame): DataFrame = {
    val labels = storedLabels.select(col("node"), col("component"))
      .localCheckpoint() // read 4x: both endpoint maps, remap, anti
    val la = labels.select(col("node").as("a"), col("component").as("ca"))
    val lb = labels.select(col("node").as("b"), col("component").as("cb"))
    val repPairs = newPairs.select(col("a"), col("b"))
      .join(la, Seq("a"), "left")
      .join(lb, Seq("b"), "left")
      .select(coalesce(col("ca"), col("a")).as("a"),
              coalesce(col("cb"), col("b")).as("b"))
    val m = connectedComponentsStar(repPairs)
      .select(col("node"), col("component").as("root"))
      .localCheckpoint() // small: touched reps + new endpoints only
    // stored members of touched components follow their root's remap
    val updatedOld = labels
      .join(m.withColumnRenamed("node", "component"), Seq("component"),
            "left")
      .select(col("node"),
              coalesce(col("root"), col("component")).as("component"))
    // endpoints the store has never seen label straight off the rep
    // graph (a pairless new node would not be here — it enters the
    // table the first time a pair touches it, as in the one-shot form)
    val newNodes = newPairs.select(col("a").as("node"))
      .union(newPairs.select(col("b").as("node"))).distinct()
      .join(labels.select("node"), Seq("node"), "left_anti")
    val newLabeled = newNodes.join(m, Seq("node"), "left")
      .select(col("node"), coalesce(col("root"), col("node")).as("component"))
    updatedOld.unionByName(newLabeled)
  }

  /** IVF-style ANN: coarse-quantize with per-partition centroids
    * ([[Udafs.VectorCentroid]] — here the embedding `label` plays the
    * cluster-assignment role a k-means pass would at 100 TB), probe the
    * `nprobe` centroids nearest the query (FAISS's recall knob —
    * scan fraction nprobe/#cells, recall monotone in nprobe because the
    * candidate set only grows), exact-search inside those partitions.
    * Centroids + query are broadcast, so the only full pass is the
    * (prunable) partition scan.
    */
  def annIvfTopK(embeddings: DataFrame, query: DataFrame, dim: Int,
                 k: Int, nprobe: Int = 1): DataFrame = {
    val cent = udaf(new Udafs.VectorCentroid(dim))
    val centroids = embeddings.groupBy("label")
      .agg(cent(col("embedding")).as("c"))
    val qDouble = transform(col("q_emb"), x => x.cast("double"))
    val bestPartitions = centroids.crossJoin(broadcast(query))
      .withColumn("csim", Functions.cosine(col("c"), qDouble))
      .orderBy(col("csim").desc_nulls_last, col("label"))
      .limit(nprobe)
      .select("label")
    cosineTopK(
      embeddings.join(broadcast(bestPartitions), "label"), query, k)
  }

  // ---- Scalar quantization (SQ8) ------------------------------------

  /** SQ8 scalar quantization — the FAISS int8 storage path: per-vector
    * symmetric codes c_i = floor(x_i·127/maxabs + 0.5) ∈ [−127, 127]
    * against the vector's max-abs scale. float32 becomes one byte per
    * dimension plus a single scale (~4× smaller stored index, and integer
    * dot products downstream). The quantize chain is ONE fixed IEEE
    * double expression (x·127/maxabs, then +0.5, then floor) shared
    * verbatim with the DuckDB oracle, so codes are bit-identical across
    * engines — the q_cosine_sim portability discipline. A zero vector
    * quantizes to all-zero codes.
    */
  def sq8Codes(embeddings: DataFrame,
               vecCol: String = "embedding"): DataFrame =
    embeddings
      .withColumn("maxabs",
        expr(s"aggregate($vecCol, cast(0.0 as double), " +
             "(a, x) -> greatest(a, abs(cast(x as double))))"))
      .withColumn("codes",
        when(col("maxabs") > 0,
          transform(col(vecCol),
            x => floor(x.cast("double") * lit(127.0) / col("maxabs")
                         + lit(0.5)).cast("int")))
          .otherwise(transform(col(vecCol), _ => lit(0))))

  /** ANN top-k through SQ8 codes: score = scale_v·scale_q·(c_v·c_q).
    * The integer dot is exact in double (≤ 127²·dim ≪ 2^53), the two
    * scales restore magnitudes, and on L2-normalized inputs the score
    * tracks cosine within ~1/127 per axis — high-fidelity enough that
    * recall@10 is near-exact (certified by q_simsearch_sq8_recall). At
    * serving scale the (vec_id, scale, codes) table IS the stored index:
    * a quarter the scan bytes of the raw float corpus, no training
    * stage, and the same broadcast-query/no-shuffle plan as the
    * brute-force path.
    */
  def annSq8TopK(embeddings: DataFrame, query: DataFrame,
                 k: Int): DataFrame = {
    val corpus = sq8Codes(
      embeddings.select(col("vec_id"), l2normalized(col("embedding")).as("v")),
      "v")
      .select(col("vec_id"), (col("maxabs") / 127.0).as("vs"), col("codes"))
    val q = sq8Codes(query.select(l2normalized(col("q_emb")).as("v")), "v")
      .select((col("maxabs") / 127.0).as("qs"), col("codes").as("qcodes"))
    corpus.crossJoin(broadcast(q))
      .withColumn("score",
        col("vs") * col("qs") *
          Functions.dotProduct(col("codes").cast("array<double>"),
                               col("qcodes").cast("array<double>")))
      .orderBy(col("score").desc_nulls_last, col("vec_id"))
      .limit(k)
      .select("vec_id")
  }

  // ---- Binary (1-bit) quantization ----------------------------------

  /** Binary quantization — the 1-bit end of the quantization ladder
    * (float32 → SQ8 → PQ → sign bits): bit i of the signature is
    * `x_i > 0`, so a 64-dim embedding packs into EXACTLY one BIGINT.
    * Hamming distance between signatures (`bit_count(a ^ b)`) tracks
    * angular distance (Charikar 2002: P[bit differs] = θ/π per
    * hyperplane — here the coordinate axes), giving a 256× smaller
    * index than the float corpus that still ranks neighbors well
    * enough for candidate generation. The signature is built
    * arithmetically (Σ 2^i, bit 63 wrapping to the sign bit), which a
    * DuckDB oracle reproduces exactly in HUGEINT then wraps to signed
    * 64-bit — so the codes hash-match cross-engine.
    *
    * CONTRACT: dim ≤ 64. Beyond that, `shiftleft(1L, i)` wraps its
    * shift amount mod 64 (JVM semantics) and silently ALIASES bit
    * i mod 64 — a >64-dim corpus needs the array-of-longs form (one
    * long per 64 dims), not a wider integer.
    */
  def binaryCodes(embeddings: DataFrame,
                  vecCol: String = "embedding"): DataFrame =
    embeddings.withColumn("sig",
      expr(s"aggregate(transform(sequence(0, size($vecCol) - 1), " +
           s"i -> IF(element_at($vecCol, i + 1) > 0, " +
           "shiftleft(1L, i), 0L)), 0L, (a, x) -> a | x)"))

  /** ANN top-k by Hamming distance over binary signatures: one
    * broadcast of the query signature, `bit_count(sig ^ qsig)` per
    * corpus row (codegen'd integer ops on ONE long per vector — the
    * cheapest possible scan), ascending top-k with vec_id tie-break.
    * The query's own signature is at distance 0, so self-retrieval is
    * exact. Serving shape matches the other ANN paths: no shuffle,
    * TakeOrderedAndProject.
    */
  def annHammingTopK(embeddings: DataFrame, query: DataFrame,
                     k: Int): DataFrame = {
    val corpus = binaryCodes(embeddings).select(col("vec_id"), col("sig"))
    val q = binaryCodes(query, "q_emb").select(col("sig").as("qsig"))
    corpus.crossJoin(broadcast(q))
      .withColumn("hd", expr("bit_count(sig ^ qsig)"))
      .orderBy(col("hd").asc_nulls_last, col("vec_id"))
      .limit(k)
      .select("vec_id")
  }

  /** The production binary-ANN shape: Hamming distance over the 1-bit
    * signatures generates a `shortlist`-sized candidate set from the
    * one-long-per-vector scan, then ONLY those rows read their raw
    * floats for an exact cosine re-rank to top-k (the same
    * shortlist-refine pattern as [[annPqTopK]]). 1 bit/dim is too lossy
    * to rank finals (raw Hamming recall@10 ≈ 0.2–0.3 here) but an
    * excellent filter: at shortlist 200 the reranked recall@10 is
    * 10/10/9 across the three SFs (q_simsearch_hamming_recall certifies
    * ≥ 9).
    */
  def annHammingRerankTopK(embeddings: DataFrame, query: DataFrame,
                           k: Int, shortlist: Int): DataFrame =
    cosineTopK(
      embeddings.join(broadcast(annHammingTopK(embeddings, query,
                                               shortlist)),
                      "vec_id"),
      query, k)

  /** Cascade ANN — the production retrieval pattern stacked from the
    * quantization ladder: the 1-bit Hamming scan prunes the corpus to
    * `shortlist1` candidates (one long per vector — the cheapest
    * possible first pass), SQ8 integer dots re-rank those to
    * `shortlist2` (codes read only for shortlist1 rows), and ONLY the
    * final `shortlist2` rows touch their raw floats for the exact
    * cosine top-k. Each stage reads a strictly smaller slice at a
    * strictly higher fidelity; at serving scale stages 1 and 2 run on
    * stored index tables ~256× and ~4× smaller than the float corpus.
    * Monotone-refinement property: the result can only improve on the
    * single-stage Hamming rerank at equal candidate budget, and
    * q_simsearch_cascade_recall certifies the end-to-end floor.
    */
  def annCascadeTopK(embeddings: DataFrame, query: DataFrame, k: Int,
                     shortlist1: Int, shortlist2: Int): DataFrame = {
    val stage1 = annHammingTopK(embeddings, query, shortlist1)
    val stage2 = annSq8TopK(
      embeddings.join(broadcast(stage1), "vec_id"), query, shortlist2)
    cosineTopK(embeddings.join(broadcast(stage2), "vec_id"), query, k)
  }

  // ---- Product quantization (PQ) ANN --------------------------------
  // All vector arithmetic goes through the native codegen'd
  // [[DotProduct]] — an interpreted HOF fold here cost 30+ s on the
  // sf0.1 training pass (the same 20× trap the expression exists for).

  private def vdot(a: Column, b: Column): Column =
    Functions.dotProduct(a, b)

  private def l2normalized(vec: Column): Column = {
    val n = Functions.l2Norm(vec)
    when(n > 0, transform(vec, x => x.cast("double") / n))
      .otherwise(transform(vec, x => lit(0.0)))
  }

  /** The m equal sub-vectors of a vector (dim must divide by m). */
  private def subVectors(vec: Column, m: Int): Column = {
    val subd = (size(vec) / m).cast("int")
    transform(sequence(lit(0), lit(m - 1)),
              i => slice(vec, i * subd + 1, subd))
  }

  /** PQ codebook training — m subspaces × k centroids over the
    * L2-normalized corpus, `iters` Lloyd rounds. Initial centroids are
    * the sub-vectors of the k smallest vec_ids (deterministic, no RNG).
    * Each round is one broadcast-assignment pass (sub-vectors ×
    * broadcast centroids → argmin via min(struct)) and one relational
    * re-center (posexplode → per-dimension avg → rebuilt array) —
    * linear in the corpus per round, and at 100 TB the training input
    * is a sample while assignment/scoring stay full-corpus.
    * Returns (sub, cid, c).
    */
  /** The shared PQ working set: one row per (vector, subspace) with the
    * normalized sub-vector AND its precomputed squared norm, checkpointed
    * once — train and compress both iterate over it, so normalization /
    * explosion / self-dot run exactly once per vector.
    */
  private def pqSubs(embeddings: DataFrame, m: Int): DataFrame =
    embeddings
      .select(col("vec_id"),
              posexplode(subVectors(l2normalized(col("embedding")), m))
                .as(Seq("sub", "v")))
      .withColumn("vv", Functions.dotProduct(col("v"), col("v")))
      .localCheckpoint()

  /** Nearest-centroid id per (vector, subspace):
    * |v−c|² = vv + cc − 2 v·c with both squared norms precomputed —
    * ONE native dot per candidate pair.
    */
  private def nearestCode(subs: DataFrame, cents: DataFrame): DataFrame =
    subs.join(broadcast(cents), "sub")
      .withColumn("d", col("vv") + col("cc") -
                         lit(2.0) * vdot(col("v"), col("c")))
      .groupBy("vec_id", "sub")
      .agg(min(struct(col("d"), col("cid"))).as("best"))
      .select(col("vec_id"), col("sub"), col("best.cid").as("code"))

  private def withCc(cents: DataFrame): DataFrame =
    cents.withColumn("cc", Functions.dotProduct(col("c"), col("c")))

  /** Default train-sample cap: Lloyd rounds converge on ~10⁵ vectors
    * (FAISS-style practice trains codebooks on a bounded sample and
    * encodes the rest) — at 10⁹ vectors this turns `iters` full-corpus
    * passes into `iters` constant-size ones. The knob is per-call: raise
    * it for huge codebooks (want ≳ 39·k sample points per centroid),
    * lower it when even one corpus pass per round is too much.
    */
  val PqMaxTrainVectors = 100000L

  private def pqTrainOnSubs(subs: DataFrame, k: Int, iters: Int,
                            maxTrain: Long = PqMaxTrainVectors): DataFrame = {
    // Bounded deterministic train sample (the q_sample_hash idiom: a
    // 32-bit md5 prefix is hash-uniform on [0, 2³²), so thresholding it
    // keeps ≈ maxTrain vectors of ANY id distribution — reproducible on
    // every cluster, no RNG state). Only the Lloyd rounds see the
    // sample; assignment/encoding stay full-corpus.
    val corpus = subs.agg(approx_count_distinct("vec_id")).head().getLong(0)
    val trainSubs =
      if (corpus <= maxTrain) subs
      else {
        val thresh = (maxTrain.toDouble / corpus * 4294967296.0).toLong
        subs.filter(
          conv(substring(md5(col("vec_id").cast("string")), 1, 8), 16, 10)
            .cast("long") < thresh)
          .localCheckpoint() // iterated iters+1 times; never re-filter
      }
    // Forgy-style init: the k vectors with the smallest md5 hash — a
    // deterministic pseudo-random spread over the corpus (k smallest
    // IDS cluster at one end of the id space and seed near-identical
    // centroids on id-correlated data; a hash order doesn't care how
    // ids are distributed). Centroid id = seed rank so codebook ids
    // are dense 0..k-1 regardless of the id space.
    val seedHash =
      conv(substring(md5(col("vec_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
    val seedIds = trainSubs.select("vec_id").distinct()
      .withColumn("__h", seedHash)
      .orderBy("__h", "vec_id").limit(k)
      .select(col("vec_id"),
              (Relational.boundedRank(col("__h"), col("vec_id")) - 1)
                .cast("long").as("cid"))
      .drop("__h")
    var cents = withCc(
      trainSubs.join(broadcast(seedIds), "vec_id")
        .select(col("sub"), col("cid"), col("v").as("c")))
      .localCheckpoint()
    // Per Lloyd round: ONE broadcast candidate join whose (vec, sub)
    // reduction carries the sub-vector alongside the argmin code (v is
    // functionally dependent on the group key, so first() is exact), then
    // ONE centroid aggregate — no join back to trainSubs, no ×subdim
    // posexplode fan-out; at 10⁹ train vectors this halves the shuffled
    // bytes per round.
    val cvd = udaf(new Udafs.VectorCentroidAny)
    (0 until iters).foreach { _ =>
      val recentered = trainSubs.join(broadcast(cents), "sub")
        .withColumn("d", col("vv") + col("cc") -
                           lit(2.0) * vdot(col("v"), col("c")))
        .groupBy("vec_id", "sub")
        .agg(min(struct(col("d"), col("cid"))).as("best"),
             first(col("v")).as("v"))
        .groupBy(col("sub"), col("best.cid").as("cid"))
        .agg(cvd(col("v")).as("c"))
      cents = withCc(recentered).localCheckpoint()
    }
    cents
  }

  def pqTrain(embeddings: DataFrame, m: Int, k: Int, iters: Int,
              maxTrain: Long = PqMaxTrainVectors): DataFrame =
    pqTrainOnSubs(pqSubs(embeddings, m), k, iters, maxTrain).drop("cc")

  /** PQ compression: every vector → m small integer codes (nearest
    * centroid per subspace). The codes table is the ANN serving set —
    * m × log₂(k) bits per vector instead of dim × 32 (64-dim floats →
    * 8 bytes at m=8, k=256: a 32× memory cut, the difference between a
    * billion-vector index fitting executor memory or not).
    */
  def pqCodes(embeddings: DataFrame, codebooks: DataFrame,
              m: Int): DataFrame =
    nearestCode(pqSubs(embeddings, m), withCc(codebooks))

  /** PQ ANN top-k: asymmetric distance computation (ADC) + exact
    * refine, the FAISS IVFPQ-with-refinement shape. Stage 1 scores ONLY
    * the codes: the normalized query's partial inner product against
    * every (subspace, centroid) pair is one m×k broadcast lookup table,
    * a vector's approximate cosine is the sum of its m entries, and the
    * best `topK × refine` candidates survive (TakeOrderedAndProject —
    * per-partition top-k, no global sort). Stage 2 re-ranks just that
    * shortlist with exact cosine on the raw vectors (a broadcast semi
    * join prunes the vector read to shortlist rows). The full corpus is
    * touched only through its codes — m×log₂(k) bits per vector — which
    * is what lets a 10⁹-vector index live in memory.
    */
  /** Memoized PQ index — (codebooks, codes), trained/encoded ONCE per
    * (session, cacheKey, knobs) and localCheckpoint-materialized. A real
    * ANN deployment builds its index offline and serves queries against
    * the stored artifact (FAISS writes it to disk); timing the Lloyd
    * rounds inside every top-k query misrepresents the serving path the
    * same way re-deriving `partsupp` per branch would misrepresent a
    * stored relation — this is the [[Tables.partsupp]] memoization
    * precedent applied to the index. Entries pinned by stopped sessions
    * are evicted lazily.
    */
  /** Content fingerprint of a DataFrame: the canonicalized logical
    * plan's semantic hash PLUS the backing files' sorted
    * path:length:mtime triples. The two parts guard different hazards:
    *
    *  - the PLAN hash separates consumers whose frames DERIVE
    *    differently from the same files — `docs` and `docs.filter(...)`
    *    can never share a memoized artifact (exprIds are normalized by
    *    canonicalization, so re-reading the same path the same way
    *    still hits) — and separates two different IN-MEMORY frames
    *    (LocalRelation equality covers the rows; r8's ""-fallback
    *    silently shared one cache entry between them);
    *  - the FILE triples change when the corpus parquet is REGENERATED
    *    IN PLACE under the same path (the harness does this between
    *    rounds): the plan hash alone would keep serving the stale
    *    artifact, since a re-read of the same path canonicalizes
    *    identically. Driver-side listing of already-resolved input
    *    files only.
    */
  private def contentFingerprint(df: DataFrame): String = {
    val planHash = java.lang.Integer.toHexString(
      df.queryExecution.analyzed.canonicalized.semanticHash())
    val files = df.inputFiles
    if (files.isEmpty) s"plan:$planHash"
    else {
      val conf = df.sparkSession.sessionState.newHadoopConf()
      val sig = files.sorted.map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        val st = p.getFileSystem(conf).getFileStatus(p)
        s"$f:${st.getLen}:${st.getModificationTime}"
      }.mkString("|")
      s"plan:$planHash|$sig"
    }
  }

  def pqIndex(embeddings: DataFrame, cacheKey: String, m: Int, k: Int,
              iters: Int,
              maxTrain: Long = PqMaxTrainVectors): (DataFrame, DataFrame) = {
    val spark = embeddings.sparkSession
    pqCache.removeIf(_._1.sparkContext.isStopped)
    val key = cacheKey + "#" + contentFingerprint(embeddings)
    pqCache.getOrElseCompute((spark, key, m, k, iters, maxTrain)) {
      val subs = pqSubs(embeddings, m)
      val books = pqTrainOnSubs(subs, k, iters, maxTrain)
        .localCheckpoint()
      val codes = nearestCode(subs, books).localCheckpoint()
      (books, codes)
    }
  }

  /** Drop every memoized PQ index for `cacheKey` (all knob combinations
    * and content fingerprints) — an in-place corpus rewrite is already
    * caught by the fingerprint in the memo key; this remains for
    * explicit lifecycle control (freeing the checkpoint blocks without
    * waiting for session end), the same hazard pairing as
    * [[Tables.invalidatePartsupp]]. (The dropped entries' checkpoint
    * blocks are reclaimed by the ContextCleaner once unreferenced.)
    */
  def invalidatePqIndex(spark: org.apache.spark.sql.SparkSession,
                        cacheKey: String): Unit =
    pqCache.removeIf(k => k._1 == spark &&
      (k._2 == cacheKey || k._2.startsWith(cacheKey + "#")))

  private[graft] val pqCache =
    new BoundedMemo[(org.apache.spark.sql.SparkSession, String, Int,
                     Int, Int, Long), (DataFrame, DataFrame)](32)

  def annPqTopK(embeddings: DataFrame, query: DataFrame, m: Int, k: Int,
                iters: Int, topK: Int, refine: Int = 5,
                maxTrain: Long = PqMaxTrainVectors,
                cacheKey: Option[String] = None): DataFrame = {
    val (books, codes) = cacheKey match {
      case Some(key) => pqIndex(embeddings, key, m, k, iters, maxTrain)
      case None =>
        val subs = pqSubs(embeddings, m) // ONE normalize+explode pass
        val b = pqTrainOnSubs(subs, k, iters, maxTrain)
        (b, nearestCode(subs, b))
    }
    pqServe(books, codes, embeddings, query, m, topK, refine)
  }

  /** ADC + exact-refine serving stanza over a (codebooks, codes) index:
    * one m×k broadcast lookup table, per-vector approximate cosine from
    * its codes, `topK × refine` shortlist, exact re-rank reading raw
    * vectors for shortlist rows only.
    */
  private def pqServe(books: DataFrame, codes: DataFrame,
                      corpus: DataFrame, query: DataFrame, m: Int,
                      topK: Int, refine: Int): DataFrame = {
    val table = query
      .select(posexplode(subVectors(l2normalized(col("q_emb")), m))
                .as(Seq("sub", "qv")))
      .join(books, "sub")
      .select(col("sub"), col("cid").as("code"),
              vdot(col("qv"), col("c")).as("pip"))
    val shortlist = codes.join(broadcast(table), Seq("sub", "code"))
      .groupBy("vec_id").agg(sum("pip").as("sim_pq"))
      .orderBy(col("sim_pq").desc_nulls_last, col("vec_id"))
      .limit(topK * refine)
      .select("vec_id")
    cosineTopK(corpus.join(broadcast(shortlist), Seq("vec_id"),
                           "left_semi"),
               query, topK)
  }

  /** IVF-PQ (the FAISS IVFPQ shape): coarse-quantize into cells, probe
    * only the cell nearest the query, then PQ-score INSIDE that cell —
    * the scan touches 1/#cells of the corpus and reads it through
    * m×log₂(k)-bit codes, composing both scale levers (partition
    * pruning × compressed residency).
    *
    * Two index variants: without `cacheKey` the codebook is trained on
    * the probed cell at query time (self-contained, what the fixture
    * specs pin — seed selection works on the cell's arbitrary id
    * subset); with `cacheKey` the serving path reads the MEMOIZED
    * full-corpus index ([[pqIndex]]) and restricts its codes to the
    * probed cell — the FAISS deployment shape, where one stored codebook
    * serves every cell and only the coarse probe is per-query.
    */
  def annIvfPqTopK(embeddings: DataFrame, query: DataFrame, dim: Int,
                   m: Int, k: Int, iters: Int, topK: Int,
                   refine: Int = 5,
                   maxTrain: Long = PqMaxTrainVectors,
                   cacheKey: Option[String] = None): DataFrame = {
    val cent = udaf(new Udafs.VectorCentroid(dim))
    val centroids = embeddings.groupBy("label")
      .agg(cent(col("embedding")).as("c"))
    val qDouble = transform(col("q_emb"), x => x.cast("double"))
    val bestPartition = centroids.crossJoin(broadcast(query))
      .withColumn("csim", Functions.cosine(col("c"), qDouble))
      .orderBy(col("csim").desc_nulls_last, col("label"))
      .limit(1)
      .select("label")
    val cell = embeddings.join(broadcast(bestPartition), "label")
    cacheKey match {
      case None =>
        annPqTopK(cell, query, m, k, iters, topK, refine,
                  maxTrain = maxTrain)
      case Some(key) =>
        val (books, codes) = pqIndex(embeddings, key, m, k, iters,
                                     maxTrain)
        val cellCodes = codes.join(broadcast(cell.select("vec_id")),
                                   Seq("vec_id"), "left_semi")
        pqServe(books, cellCodes, cell, query, m, topK, refine)
    }
  }

  /** Maximal-marginal-relevance re-rank (Carbonell & Goldstein, SIGIR
    * 1998) — the diversity pass a retrieval/serving stack runs AFTER
    * ANN: from a bounded relevance shortlist, greedily pick items
    * maximizing λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s), ties to the
    * smaller id. The shortlist (shortlistK rows) is localCheckpointed
    * once; each greedy step is a bounded anti-join + cross-join against
    * the ≤ outK selected rows — every stage is constant-size, so the
    * whole rerank costs O(outK · shortlistK) similarity evaluations no
    * matter the corpus size behind the shortlist. Results are
    * deterministic end-to-end (cosines are fixed IEEE expression trees,
    * argmax ties break by id), which is what lets a DuckDB recursive CTE
    * hash-match the selection.
    */
  def mmrRerank(embeddings: DataFrame, query: DataFrame, shortlistK: Int,
                outK: Int, lambda: Double): DataFrame = {
    val short = embeddings.crossJoin(broadcast(query))
      .withColumn("rel", Functions.cosine(col("embedding"), col("q_emb")))
      .orderBy(col("rel").desc_nulls_last, col("vec_id"))
      .limit(shortlistK)
      .select(col("vec_id"), col("embedding"), col("rel"))
      .localCheckpoint()
    var sel = short.orderBy(col("rel").desc_nulls_last, col("vec_id"))
      .limit(1)
      .select(col("vec_id"), col("embedding"), col("rel"),
              lit(1L).as("mmr_rank"))
      .localCheckpoint()
    (2 to outK).foreach { step =>
      val next = short
        .join(broadcast(sel.select("vec_id")), Seq("vec_id"), "left_anti")
        .crossJoin(broadcast(sel.select(col("embedding").as("s_emb"))))
        .withColumn("s_sim",
                    Functions.cosine(col("embedding"), col("s_emb")))
        .groupBy("vec_id")
        .agg(first(col("embedding")).as("embedding"),
             first(col("rel")).as("rel"), max(col("s_sim")).as("max_sim"))
        .withColumn("score",
                    lit(lambda) * col("rel") -
                      lit(1 - lambda) * col("max_sim"))
        .orderBy(col("score").desc_nulls_last, col("vec_id"))
        .limit(1)
        .select(col("vec_id"), col("embedding"), col("rel"),
                lit(step.toLong).as("mmr_rank"))
      sel = sel.unionByName(next).localCheckpoint()
    }
    sel.select(col("vec_id"), col("mmr_rank"))
  }

  /** Deterministic weighted sampling without replacement
    * (Efraimidis–Spirakis, IPL 2006): each row draws a hash-uniform
    * u ∈ (0,1) from its id and scores key = ln(u)/w; the k rows with the
    * LARGEST key (closest to 0) are a weight-proportional sample — the
    * quality-weighted subsampling step of a curation pipeline, with zero
    * RNG state: identical output on any cluster and any partitioning.
    * `orderBy(...).limit(k)` compiles to TakeOrderedAndProject —
    * per-partition top-k then a k-row merge, never a global sort.
    */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
                     k: Int): DataFrame = {
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
               .cast("double") + 0.5) / 4294967296.0
    df.withColumn("__es_key", log(u) / weight.cast("double"))
      .orderBy(col("__es_key").desc_nulls_last, col(idCol))
      .limit(k)
      .drop("__es_key")
  }

  /** Language ID by stopword voting: per-language marker-token counts,
    * argmax wins (deterministic tie-break by language order). A real
    * deployment swaps the marker lists; the operator shape — N conditional
    * counts + greatest() — is the scalable part.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "zu"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "fr" -> Seq("le", "la", "de", "et", "que"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  def langScores(toks: Column): Seq[(String, Column)] =
    langMarkers.map { case (lang, words) =>
      lang -> size(filter(toks,
        t => array_contains(array(words.map(lit): _*), t))).cast("long")
    }

  def langId(toks: Column): Column = {
    val scores = langScores(toks)
    // argmax with first-listed language winning ties
    scores.tail.foldLeft(
      (lit(scores.head._1), scores.head._2)) { case ((bestL, bestS), (l, s)) =>
      (when(s > bestS, lit(l)).otherwise(bestL),
       when(s > bestS, s).otherwise(bestS))
    }._1
  }

  private[graft] val ccCache =
    new BoundedMemo[(org.apache.spark.sql.SparkSession, String),
                    DataFrame](32)

  /** The duplicate-cluster map (node → component) over the exact-Jaccard
    * pair graph, memoized per (session, corpus content fingerprint,
    * knobs) — the stored-artifact shape of production: a curation run
    * computes the cluster map ONCE and every downstream consumer
    * (survivor selection, leakage-safe splitting, reporting) reads it.
    * The raw q_dedup_components* keys stay unmemoized on purpose — they
    * ARE the benchmark of the clustering op itself.
    *
    * Skew-hardened: exact duplicates collapse to representatives
    * BEFORE the mine ([[exactCollapse]], blocked on `langCol` so the
    * lang-blocked pair semantics are preserved bit-for-bit); the
    * member edges re-enter the graph as the J = 1 pairs they are, so
    * the (node, component) output is IDENTICAL to mining the full
    * corpus — a 10k-copy boilerplate class just never reaches the
    * quadratic candidate space.
    */
  def jaccardComponents(docs: DataFrame, idCol: String, textCol: String,
                        langCol: String, k: Int,
                        minSim: Double): DataFrame = {
    val spark = docs.sparkSession
    ccCache.removeIf(_._1.sparkContext.isStopped)
    val key = s"$idCol/$textCol/$langCol/$k/$minSim#" +
      contentFingerprint(docs)
    ccCache.getOrElseCompute((spark, key)) {
      val (reps, memberEdges) =
        exactCollapse(docs, idCol, textCol, Seq(langCol))
      connectedComponentsStar(
        ngramJaccardPairs(reps, idCol, textCol, langCol, k, minSim)
          .select("a", "b").union(memberEdges))
        .localCheckpoint()
    }
  }

  /** Per-document BM25 score over a literal query-term set — the shared
    * lexical scorer behind q_text_bm25 and q_rrf_fusion's lexical leg.
    * Each per-(doc, term) score is deterministic in both engines (tf /
    * df / dl / avgdl are exact integers-in-doubles, and the score
    * formula is single-op correctly-rounded arithmetic), so it
    * integerizes to floor(tscore·10⁶) BEFORE the per-doc sum — and a
    * LONG sum is order-invariant by construction, which puts the
    * reduction back in a codegen'd hash aggregate with map-side partial
    * combine (the q_classify_nb / PageRank fixed-point discipline; the
    * r8 ordered collect_list+fold bought the same invariance at 1.6×
    * the cost). Returns (idCol, bm25_e6, n_terms); raw text never
    * shuffles (the term filter prunes tokens before the one narrow
    * checkpoint).
    */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
                 terms: Seq[String], k1: Double = 1.2,
                 b: Double = 0.75): DataFrame = {
    val termArr = array(terms.map(lit): _*)
    val perDoc = docs
      .select(col(idCol), tokens(col(textCol), normalize = true)
                .as("toks"))
      .select(col(idCol), size(col("toks")).cast("double").as("dl"),
              filter(col("toks"),
                     t => array_contains(termArr, t)).as("qtoks"))
      .localCheckpoint() // O(docs) narrow rows, never the raw text
    val stats = perDoc.agg(count(lit(1)).cast("double").as("n_docs"),
                           avg("dl").as("avgdl"))
    val tf = perDoc
      .select(col(idCol), col("dl"), explode(col("qtoks")).as("token"))
      .groupBy(idCol, "dl", "token")
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy("token")
      .agg(countDistinct(col(idCol)).cast("double").as("df"))
    tf.join(broadcast(dfreq), "token")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("tscore",
        col("idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(idCol)
      .agg(sum(expr("CAST(floor(tscore * 1000000.0) AS BIGINT)"))
             .as("bm25_e6"),
           count(lit(1)).as("n_terms"))
  }

  private[graft] val bpeCache =
    new BoundedMemo[(org.apache.spark.sql.SparkSession, String, String,
                     Int), (DataFrame, DataFrame)](32)

  /** BPE merge learning (Sennrich et al. 2016) over the
    * frequency-weighted word vocabulary: `iters` rounds of
    * adjacent-pair count → one-row argmax → merge-everywhere. The merge
    * application is a pure per-word array map — exact because candidacy
    * is restricted to a ≠ b pairs, the only overlap-free case (self-pair
    * merges need sequential greedy state engines disagree on). Returns
    * (merge table: step, a, b, total; final symbolized vocabulary:
    * word, cnt, sym) — memoized per (session, corpus content
    * fingerprint, iters), the pqIndex discipline, so the train and
    * apply query keys pay the eager rounds once per corpus.
    */
  def bpeTrain(docs: DataFrame, textCol: String,
               iters: Int): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    bpeCache.removeIf(_._1.sparkContext.isStopped)
    val key = textCol + "#" + contentFingerprint(docs)
    bpeCache.getOrElseCompute((spark, key, textCol, iters)) {
      bpeTrainUncached(docs, textCol, iters)
    }
  }

  private def bpeTrainUncached(docs: DataFrame, textCol: String,
                               iters: Int): (DataFrame, DataFrame) = {
    var v = docs
      .select(explode(tokens(col(textCol), normalize = true)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(col("word"), col("cnt"),
              expr("transform(sequence(1, length(word)), " +
                   "i -> substring(word, i, 1))").as("sym"))
      .localCheckpoint()
    val merges = (1 to iters).iterator.map { step =>
      val best = v
        .select(col("cnt"), explode(expr(
            "CASE WHEN size(sym) >= 2 THEN " +
            "filter(transform(sequence(1, size(sym) - 1), i -> " +
            "named_struct('a', element_at(sym, i), " +
            "'b', element_at(sym, i + 1))), x -> x.a != x.b) " +
            "ELSE array() END")).as("pr"))
        .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
        .agg(sum("cnt").as("total"))
        .orderBy(col("total").desc, col("a"), col("b")).limit(1)
        .withColumn("step", lit(step.toLong))
        .localCheckpoint()
      // no mergeable a != b pair left: crossJoin(empty) would silently
      // annihilate the vocabulary — stop learning instead
      if (best.isEmpty) None else Some { best }
    }.takeWhile(_.isDefined).map(_.get).map { best =>
      v = v.crossJoin(broadcast(
            best.select(col("a").as("__a"), col("b").as("__b"))))
        .select(col("word"), col("cnt"), expr(
          "filter(transform(sequence(1, size(sym)), i -> " +
          "CASE WHEN element_at(sym, i) = __a AND i < size(sym) " +
          "AND element_at(sym, i + 1) = __b THEN concat(__a, __b) " +
          "WHEN i > 1 AND element_at(sym, i - 1) = __a " +
          "AND element_at(sym, i) = __b THEN NULL " +
          "ELSE element_at(sym, i) END), x -> x IS NOT NULL)")
          .as("sym"))
        .localCheckpoint()
      best
    }.toList
    if (merges.isEmpty) {
      // zero mergeable a != b pairs anywhere (degenerate corpus): an
      // EMPTY merge table plus the untouched symbolized vocabulary,
      // not an exception — the oracle's LEFT-JOIN chain yields zero
      // b_k rows and v_K = v0 on the same corpus, and the engines
      // must agree on degenerate input too (ADVICE r8)
      val spark = docs.sparkSession
      import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
      val schema = StructType(Seq(
        StructField("a", StringType), StructField("b", StringType),
        StructField("total", LongType), StructField("step", LongType)))
      (spark.createDataFrame(
         spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema), v)
    } else (merges.reduce(_ unionByName _), v)
  }

  /** Johnson–Lindenstrauss ±1 random projection (Achlioptas 2003) to
    * `rDim` coordinates: out[p] = Σᵢ vec[i]·sign(md5(p_i)) — the dense
    * sign projection that preserves pairwise distances within ε w.h.p.
    * while cutting per-candidate scan cost dim/rDim ×. Deterministic
    * [[md5Sign]] coefficients (no fitted model, identical on any
    * cluster), each coordinate one codegen'd [[Functions.dotProduct]].
    */
  def rpProject(vec: Column, rDim: Int, dim: Int = 64): Column =
    array((0 until rDim).map { p =>
      val coeffs = array((0 until dim).map(i =>
        lit(md5Sign(p, i).toFloat)): _*)
      Functions.dotProduct(vec, coeffs)
    }: _*)

  /** Reduced-dimension ANN serving: shortlist by cosine in the
    * [[rpProject]] space (4× less arithmetic per candidate at
    * rDim = 16), exact-rerank the shortlist in full dimension — the
    * third compression axis next to SQ8 (fewer bits) and binary (one
    * bit): fewer DIMENSIONS. Same broadcast-query, no-shuffle plan as
    * the other ANN paths.
    */
  def annRpTopK(embeddings: DataFrame, query: DataFrame, rDim: Int,
                k: Int, shortlist: Int): DataFrame = {
    val qr = query.select(col("q_emb"),
                          rpProject(col("q_emb"), rDim).as("q_rvec"))
    val short = embeddings
      .withColumn("rvec", rpProject(col("embedding"), rDim))
      .crossJoin(broadcast(qr))
      .withColumn("rsim", Functions.cosine(col("rvec"), col("q_rvec")))
      .orderBy(col("rsim").desc_nulls_last, col("vec_id"))
      .limit(shortlist)
      .select("vec_id", "embedding")
    cosineTopK(short, query, k)
  }

  /** Winnowing fingerprint selection (Schleimer et al. 2003): the
    * minimum (ties → rightmost) k-gram hash of every w-window, distinct
    * per doc — any shared run of ≥ w+k−1 tokens between two docs yields
    * a shared (h) fingerprint (the local guarantee a stride sample
    * lacks). Portable md5 gram hashes; the per-window argmin runs as a
    * bounded fold inside per-document array expressions (see the body
    * comment), so the operator itself is shuffle-free. Returns
    * (idCol, pos, h), distinct per doc.
    */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
                         k: Int = 3, w: Int = 4): DataFrame =
    // Selection runs ENTIRELY inside per-doc array expressions — no
    // explode-then-shuffle: each window's argmin (ties → rightmost) is
    // the native [[WinnowMinima]] loop over the gram-hash array (r16;
    // previously an interpreted aggregate-HOF fold allocating a struct
    // per comparison — see the expression's scaladoc for the exactness
    // contract and WinnowMinimaSpec for the term-for-term equivalence
    // proof against the HOF form). The operator stays embarrassingly
    // parallel per document and its only shuffle is whatever the caller
    // aggregates next. "Embarrassingly parallel" needs partitions to be
    // embarrassed across: spread (no-op on real corpora) so the per-doc
    // window argmins don't serialize on a single-row-group input.
    Relational.spread(docs)
      .select(col(idCol),
              tokens(col(textCol), normalize = true).as("tk"))
      .select(col(idCol),
              // native gram-hash loop (r16) — one compiled pass over
              // the sliding k-windows, same md5-prefix values as the
              // transform+array_join+conv HOF chain it replaced (see
              // [[Md5KGramHashes]]; Md5NativeSpec pins equality)
              org.apache.spark.sql.graft.ColumnBridge.column(
                Md5KGramHashes(org.apache.spark.sql.graft.ColumnBridge
                                 .expression(col("tk")), k, 8)).as("hs"))
      .select(col(idCol),
              explode(org.apache.spark.sql.graft.ColumnBridge.column(
                WinnowMinima(org.apache.spark.sql.graft.ColumnBridge
                               .expression(col("hs")), w))).as("sel"))
      .select(col(idCol), col("sel.pos").as("pos"), col("sel.h").as("h"))

  /** Deterministic synthetic link graph: each id in `ids` (single column
    * `id`) emits `outDeg` edges to md5-derived targets in [0, n) — the
    * portable-hash idiom of [[hyperplaneBucket]], standing in for a
    * crawl's href edges. `nDf` is a broadcastable one-row (n) frame so no
    * driver action runs at plan time.
    */
  def md5LinkEdges(ids: DataFrame, nDf: DataFrame, outDeg: Int): DataFrame =
    ids.crossJoin(broadcast(nDf.toDF("__n")))
      .select(col("id").as("src"),
              explode(array((0 until outDeg).map(lit): _*)).as("j"),
              col("__n"))
      .select(col("src"),
              pmod(conv(substring(md5(concat(
                       col("src").cast("string"), lit("_"),
                       col("j").cast("string"))), 1, 8), 16, 10)
                     .cast("long"),
                   col("__n")).as("dst"))

  /** Fixed-point link-mass propagation shared by PageRank and TrustRank:
    * `iters` rounds of pr'(j) = base(j) + Σ_{i→j} (pr(i)·85) div
    * (100·outDeg) in EXACT integer arithmetic (1.0 ≡ 10⁹), so the
    * per-target sum is
    * summation-order-invariant and the recurrence hash-matches a SQL
    * replay — float propagation cannot (shuffle order). One hash join +
    * one hash aggregate per round, localCheckpoint-ed (the
    * connected-components lineage discipline). `base` must carry every
    * node id: (id, b); `pr0` is the initial score (id, pr).
    */
  def fixedPointPropagate(base: DataFrame, pr0: DataFrame,
                          edges: DataFrame, iters: Int,
                          outDeg: Int): DataFrame = {
    var pr = pr0
    for (_ <- 1 to iters) {
      val contrib = edges.join(pr, col("src") === col("id"))
        .select(col("dst"),
                expr(s"(pr * 85) div ${100 * outDeg}").as("c"))
        .groupBy("dst").agg(sum("c").as("cin"))
      pr = base
        .join(contrib, col("id") === col("dst"), "left")
        .select(col("id"),
                (col("b") + coalesce(col("cin"), lit(0L))).as("pr"))
        .localCheckpoint()
    }
    pr
  }

  /** HITS hubs & authorities (Kleinberg 1999) in the same fixed-point
    * integer discipline as [[fixedPointPropagate]]: per round,
    * a'(j) = Σ_{i→j} h(i) div outDeg then h'(i) = Σ_{i→j} a'(j) div
    * outDeg (1.0 ≡ 10⁹). The div-outDeg transfer replaces the float L2
    * normalization — it bounds total mass (uniform out-degree makes
    * each half-round mass-preserving up to floor loss) while keeping
    * every sum an order-invariant BIGINT, which is what lets the score
    * vector hash-match a SQL replay; a float-normalized HITS cannot.
    * Per half-round: one hash join + one hash aggregate + a zero-fill
    * left join over the node set, localCheckpoint-ed.
    * Returns (id, auth, hub).
    */
  def hitsScores(ids: DataFrame, edges: DataFrame, iters: Int,
                 outDeg: Int): DataFrame = {
    // No per-round zero-fill: a node absent from `a`/`h` scores 0, and
    // zero rows contribute nothing to the next matvec, so the join to
    // the full node set happens ONCE at the end — one materialized job
    // per round (h; a stays lazy, one join+agg of lineage on top of the
    // checkpointed h) instead of four.
    var h = ids.select(col("id"), lit(1000000000L).as("h"))
    var a = ids.select(col("id"), lit(0L).as("a"))
    for (_ <- 1 to iters) {
      a = edges.join(h, col("src") === col("id"))
        .select(col("dst"), expr(s"h div $outDeg").as("c"))
        .groupBy("dst").agg(sum("c").as("a"))
        .select(col("dst").as("id"), col("a"))
      h = edges.join(a, col("dst") === col("id"))
        .select(col("src"), expr(s"a div $outDeg").as("c"))
        .groupBy("src").agg(sum("c").as("h"))
        .select(col("src").as("id"), col("h"))
        .localCheckpoint()
    }
    ids
      .join(a.select(col("id"), col("a").as("auth")), Seq("id"), "left")
      .join(h.select(col("id"), col("h").as("hub")), Seq("id"), "left")
      .select(col("id"), coalesce(col("auth"), lit(0L)).as("auth"),
              coalesce(col("hub"), lit(0L)).as("hub"))
  }

  /** Integer Lloyd k-means over e4-grid coordinates — the clustering
    * loop that CAN hash-match a SQL replay, unlike float Lloyd (whose
    * mean re-centering carries partial-merge noise; that is exactly why
    * the PQ codebook path is certified by recall floors instead).
    * Determinism stack: Forgy seeds = the k smallest md5-hashed vec_ids
    * (the [[pqTrainOnSubs]] idiom), squared distances are exact BIGINT
    * (diff ≤ 2·10⁴ per dim), argmin ties break to the lower cid,
    * re-centering is the exact rational mean floored per dimension
    * (sign-split division — Spark `div` truncates, DuckDB `//`
    * floors), and an emptied cluster keeps its previous centroid
    * rather than dividing by zero. Per round: one broadcast
    * assignment join + one hash aggregate — linear in the corpus.
    * Returns the final assignment (vec_id, cluster, d) with d the
    * exact integer squared distance to the winning centroid.
    */
  def kmeansInteger(embeddings: DataFrame, k: Int,
                    iters: Int): DataFrame =
    kmeansFit(embeddings, k, iters)._2

  /** The (centroids, assignment) pair behind [[kmeansInteger]] —
    * centroids (cid, i, c) on the e4 grid, assignment (vec_id,
    * cluster, d). Exposed for IVF-style serving over the fitted
    * index.
    */
  /** e4-grid integer coordinates of an embedding frame, one row per
    * (vec_id, dim) — the shared first step of every exact-integer
    * embedding op (k-means, PCA, projections).
    */
  private[graft] def intCoords(embeddings: DataFrame): DataFrame =
    Relational.spread(embeddings)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("p", "xv")))
      .select(col("vec_id"), (col("p") + 1).cast("long").as("i"),
              expr("CAST(floor(CAST(xv AS DOUBLE) * 10000.0) AS BIGINT)")
                .as("x"))

  /** Exact-integer nearest-centroid assignment of coordinate rows to a
    * broadcast (cid, i, c) centroid table — lower-cid tie-break.
    * Returns (vec_id, cluster, d).
    */
  private[graft] def assignToCentroids(x: DataFrame,
                                       cents: DataFrame): DataFrame = x
    .join(broadcast(cents), "i")
    .groupBy("vec_id", "cid")
    .agg(sum((col("x") - col("c")) * (col("x") - col("c"))).as("d"))
    .groupBy("vec_id")
    .agg(min(struct(col("d"), col("cid"))).as("best"))
    .select(col("vec_id"), col("best.cid").as("cluster"),
            col("best.d").as("d"))

  /** Forgy seeds: the k md5-smallest vec_ids, cid = dense seed rank. */
  private[graft] def forgySeeds(embeddings: DataFrame,
                                k: Int): DataFrame =
    embeddings.select(col("vec_id"))
      .withColumn("__h",
        conv(substring(md5(col("vec_id").cast("string")), 1, 8), 16, 10)
          .cast("long"))
      .orderBy("__h", "vec_id").limit(k)
      .select(col("vec_id"),
              (Relational.boundedRank(col("__h"), col("vec_id")) - 1)
                .cast("long").as("cid"))

  def kmeansFit(embeddings: DataFrame, k: Int,
                iters: Int): (DataFrame, DataFrame) = {
    // r16 map-only assignment. The r15 shape kept the corpus EXPLODED
    // ((vec_id, i, x) rows) and each round paid: a ×k fan-out join on i,
    // two hash aggregates (per-(vec,cid) distance, per-vec argmin), and
    // a re-join of the assignment back onto the exploded coords by
    // vec_id — two corpus-sized exchanges per round. The corpus now
    // stays ONE ROW PER VECTOR (e4-grid coordinate array); the k
    // centroids collapse to a single broadcast row of (cid, cs) structs,
    // and the per-vector argmin runs IN-ROW (zip_with + aggregate +
    // array_min over (d, cid) structs — same exact BIGINT distances,
    // same lower-cid tie-break). The winning row still carries its
    // coordinate array, so re-centering explodes the winners directly:
    // the ONLY exchange left per round moves k·dims pre-aggregated
    // partial rows per partition. Distances are bit-identical (null
    // coordinate elements contribute 0 to the in-row sum exactly as
    // sum() skips them in the aggregate form; coordinate COUNTS per
    // (cid, i) include null-x rows in both forms via count(1)).
    val base = Relational
      .spread(embeddings.filter(col("embedding").isNotNull))
      .select(col("vec_id"),
              expr("transform(embedding, xv -> " +
                   "CAST(floor(CAST(xv AS DOUBLE) * 10000.0) AS BIGINT))")
                .as("xs"))
      .localCheckpoint() // re-read every assignment round
    var cents = base.join(broadcast(forgySeeds(embeddings, k)), "vec_id")
      .select(col("cid"), posexplode(col("xs")).as(Seq("p", "c")))
      .select(col("cid"), (col("p") + 1).cast("long").as("i"), col("c"))
      .localCheckpoint()
    // Assignment = the native [[SqDistArgmin]] loop over the
    // driver-collected k·dims centroid grid (bounded by construction,
    // corpus-independent — the [[pcaFromPartials]] bounded-collect
    // discipline). One map-only pass, no per-round join/aggregate
    // stages, no interpreted HOFs, stable codegen across rounds; see
    // the expression's scaladoc for the exactness contract.
    def assign(c: DataFrame): DataFrame = {
      val byCid = c.collect() // bounded: k·dims rows
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (cid, rows) => (cid, rows.sortBy(_._2)) }
      val argmin = SqDistArgmin(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("xs")),
        byCid.map(_._1).toArray,
        byCid.map(_._2.map(t => (t._2 - 1).toInt).toArray).toArray,
        byCid.map(_._2.map(_._3).toArray).toArray)
      base.withColumn("best",
          org.apache.spark.sql.graft.ColumnBridge.column(argmin))
        .select(col("vec_id"), col("best.cid").as("cluster"),
                col("best.d").as("d"), col("xs"))
    }
    for (_ <- 1 to iters) {
      val sums = assign(cents)
        .select(col("cluster").as("cid"),
                posexplode(col("xs")).as(Seq("p", "x")))
        .groupBy(col("cid"), (col("p") + 1).cast("long").as("i"))
        .agg(sum("x").as("s"), count(lit(1)).as("n"))
      cents = cents.select(col("cid"), col("i"), col("c").as("c_old"))
        .join(sums, Seq("cid", "i"), "left")
        .select(col("cid"), col("i"), expr(
          "CASE WHEN n IS NULL THEN c_old " +
          "WHEN s < 0 THEN -((-s) div n) ELSE s div n END").as("c"))
        .localCheckpoint()
    }
    (cents, assign(cents).select(col("vec_id"), col("cluster"), col("d")))
  }

  private val kmCache =
    new BoundedMemo[(org.apache.spark.sql.SparkSession, String, Int,
                     Int), (DataFrame, DataFrame)](32)

  /** Memoized k-means index — the [[pqIndex]] stored-artifact
    * discipline: a deployment fits the coarse quantizer ONCE and every
    * query serves against the stored (centroids, assignment); the
    * q_cluster_kmeans key itself stays unmemoized on purpose (it IS
    * the benchmark of the fit). Keyed by content fingerprint, so an
    * in-place corpus rewrite or a derived frame can't serve a stale or
    * foreign index.
    */
  def kmIndex(embeddings: DataFrame, cacheKey: String, k: Int,
              iters: Int): (DataFrame, DataFrame) = {
    val spark = embeddings.sparkSession
    kmCache.removeIf(_._1.sparkContext.isStopped)
    val key = cacheKey + "#" + contentFingerprint(embeddings)
    kmCache.getOrElseCompute((spark, key, k, iters)) {
      val (c, a) = kmeansFit(embeddings, k, iters)
      (c, a.localCheckpoint())
    }
  }

  /** IVF top-k over the integer-k-means coarse quantizer — the ANN
    * serving path whose ENTIRE pipeline hash-matches a SQL replay (no
    * recall floor needed): the fit is [[kmeansFit]]'s exact-integer
    * recurrence, the probe is an exact-integer argmin over k centroid
    * distances, and the in-cell ranking is the bit-portable exact
    * cosine. One cell is scanned per query (partition pruning); the
    * probe and query are 1-row broadcasts, so serving adds no
    * shuffle.
    */
  def annKmeansTopK(embeddings: DataFrame, query: DataFrame, k: Int,
                    iters: Int, topK: Int,
                    cacheKey: Option[String] = None): DataFrame = {
    val (cents, assign) = cacheKey match {
      case Some(key) => kmIndex(embeddings, key, k, iters)
      case None => kmeansFit(embeddings, k, iters)
    }
    val qx = query.select(
        posexplode(col("q_emb")).as(Seq("p", "xv")))
      .select((col("p") + 1).cast("long").as("i"),
              expr("CAST(floor(CAST(xv AS DOUBLE) * 10000.0) AS BIGINT)")
                .as("qx"))
    val probe = cents.join(broadcast(qx), "i")
      .groupBy("cid")
      .agg(sum((col("qx") - col("c")) * (col("qx") - col("c"))).as("d"))
      .orderBy("d", "cid").limit(1)
      .select(col("cid").as("__probe"))
    assign.crossJoin(broadcast(probe))
      .filter(col("cluster") === col("__probe"))
      .join(embeddings, "vec_id")
      .crossJoin(broadcast(query))
      .withColumn("sim_raw",
                  Functions.cosine(col("embedding"), col("q_emb")))
      .orderBy(col("sim_raw").desc_nulls_last, col("vec_id"))
      .limit(topK)
      .select(col("vec_id"), round(col("sim_raw"), 4).as("sim"))
  }

  /** Top principal component of the embedding cloud by FIXED-POINT
    * power iteration — the PCA-lite an embedding-quality/drift monitor
    * runs. Structure mirrors production: the distributed work is ONE
    * corpus pass building the dims×dims scatter matrix (self-join on
    * vec_id + hash aggregate, map-side combinable — 100 TB of vectors
    * reduce to 64×64 partial sums per partition); the iteration then
    * runs over that broadcast-sized matrix.
    *
    * Every quantity is an exact integer, so the result hash-matches a
    * SQL replay: coordinates integerize to the e4 grid; the centered
    * scatter is ⌊(n·Σxᵢxⱼ − SᵢSⱼ)/n²⌋ — the covariance itself (same
    * eigenvectors), whose entries are ≤ 2·10⁸ REGARDLESS of corpus
    * size (see [[centeredScatter]] for the DECIMAL(38,0) routing of
    * the n²-scaled intermediate); each iterate rescales to
    * |v|∞ ≤ 10⁵ by an integer divisor. Division of SIGNED values is
    * written sign-split (CASE + abs) because Spark's `div` truncates
    * while DuckDB's `//` floors — they agree only on non-negative
    * operands. Matvec sums ride DECIMAL(38,0) and cast back (bounded
    * ≤ 64·2·10¹³ with |c| n-independent, so the bound holds at any n).
    * Quantization keeps the direction within ~10⁻⁴ per round of the
    * float iterate — the spec pins alignment with a planted dominant
    * axis. Returns (dim 1-based, v) with v on the ±10⁵ grid.
    */
  def pcaTopComponent(embeddings: DataFrame, dims: Int,
                      iters: Int): DataFrame =
    pcaFromPartials(scatterPartials(embeddings), iters)

  /** The exact integer scatter statistics of an embedding batch in ONE
    * unified mergeable layout — (kind, i, j, v) rows: kind "n" the
    * vector count, "s" the per-dimension coordinate sums, "p" the
    * pairwise power sums. All BIGINT, all additive: summing two
    * batches' partials per (kind, i, j) IS the scatter of their union
    * (integer addition is exact and associative), which is what lets a
    * streaming sink maintain the state incrementally.
    */
  private[graft] def scatterPartials(embeddings: DataFrame): DataFrame = {
    // r16 join-free form. The r15 shape exploded to (vec_id, i, x) rows,
    // localCheckpointed them, and SELF-JOINED on vec_id to enumerate
    // (i, j) products — two shuffles of n·dims rows plus an n·dims²-row
    // join, all keyed on vec_id only to pair coordinates that were
    // adjacent in the source row to begin with. The pairs are instead
    // generated IN-ROW (posexplode × posexplode over a slice), so the
    // only exchange left in the p branch moves ≤ dims²/2 pre-aggregated
    // partial rows per partition: 2 Exchange + SortMergeJoin + eager
    // checkpoint → 0 joins, partial-agg-only exchanges. Only the UPPER
    // triangle (j ≥ i) is generated — x·y is symmetric — and the strict
    // lower mirror is re-emitted from the 2080-row aggregate, halving
    // the generated rows. Values are bit-identical: integer products
    // summed in DECIMAL(38,0) are order-independent.
    val xs = Relational.spread(embeddings).select(
      expr("transform(embedding, xv -> " +
           "CAST(floor(CAST(xv AS DOUBLE) * 10000.0) AS BIGINT))").as("xs"))
    val n = embeddings.agg(count(lit(1)).cast("long").as("v"))
      .select(lit("n").as("kind"), lit(0L).as("i"), lit(0L).as("j"),
              col("v"))
    val s = xs.select(posexplode(col("xs")).as(Seq("p", "x")))
      .groupBy((col("p") + 1).cast("long").as("i"))
      .agg(sum("x").as("v"))
      .select(lit("s").as("kind"), col("i"), lit(0L).as("j"), col("v"))
    // slice(xs, pi+1, size-pi) = [x_i .. x_dims] (pi is 0-based, slice
    // start 1-based), so j = i + pj enumerates exactly j ≥ i
    val upper = xs
      .select(col("xs"), posexplode(col("xs")).as(Seq("pi", "xi")))
      .select(col("xi"), (col("pi") + 1).cast("long").as("i"),
              posexplode(expr("slice(xs, pi + 1, size(xs) - pi)"))
                .as(Seq("pj", "xj")))
      .groupBy(col("i"), (col("i") + col("pj")).cast("long").as("j"))
      .agg(expr("CAST(sum(CAST(xi * xj AS DECIMAL(38,0))) AS BIGINT)")
             .as("v"))
    // both orientations emitted from ONE aggregate via an in-plan
    // explode — a union-of-two-consumers form lets the i≠j mirror
    // filter push below the aggregate's exchange, defeating reuse and
    // running the whole fan-out twice (caught in the r16 plan dump)
    val p = upper
      .select(explode(when(col("i") === col("j"),
                array(struct(col("i"), col("j"))))
              .otherwise(array(struct(col("i"), col("j")),
                               struct(col("j").as("i"),
                                      col("i").as("j"))))).as("ij"),
              col("v"))
      .select(lit("p").as("kind"), col("ij.i").as("i"),
              col("ij.j").as("j"), col("v"))
    n.unionByName(s).unionByName(p)
  }

  /** Power iteration over (possibly unmerged) scatter partials — the
    * serving half of [[pcaTopComponent]], also fed by the streaming
    * scatter store. Partials are re-summed per (kind, i, j) first, so
    * both a one-shot batch and an accumulated multi-batch store are
    * valid inputs.
    */
  private[graft] def pcaFromPartials(partials: DataFrame,
                                     iters: Int): DataFrame = {
    val spark = partials.sparkSession
    val vs = 100000L // iterate infinity-norm scale
    val nDf = partials.filter(col("kind") === "n")
      .agg(sum("v").as("n"))
    val s = partials.filter(col("kind") === "s")
      .groupBy("i").agg(sum("v").as("s"))
    val p = partials.filter(col("kind") === "p")
      .groupBy("i", "j").agg(sum("v").as("p"))
    val c = centeredScatter(nDf, s, p)
    // The scatter matrix is O(dims²) — bounded by construction, never
    // by the corpus — so the iteration runs DRIVER-side over the
    // collected matrix (the production shape: the distributed pass
    // ends at the 64×64 aggregate). Exact BigInt sums, floorDiv on
    // the non-negative magnitudes: the identical integer recurrence
    // the oracle's generated SQL replays.
    val cm = c.collect().map(r => (r.getLong(0), r.getLong(1),
                                   BigInt(r.getLong(2))))
    val v = powerIterate(cm, iters)
    import spark.implicits._
    v.toSeq.sortBy(_._1).map { case (i, x) => (i, x.toLong) }
      .toDF("dim", "v")
  }

  private val PcaVs = 100000L // iterate infinity-norm scale

  /** Centered scatter from (n, s, p) partials: c = ⌊(n·p − sᵢ·sⱼ)/n²⌋
    * per entry — the plain covariance on the e8 grid, NOT the n-scaled
    * form. The intermediate m = n·p − sᵢ·sⱼ reaches ~2n²·10⁸ (past
    * BIGINT at n ≈ 2·10⁵ vectors), so it rides DECIMAL(38,0); the ÷n²
    * runs as two nested sign-split ⌊·/n⌋ steps (⌊⌊m/n⌋/n⌋ = ⌊m/n²⌋ on
    * the non-negative magnitudes; the first quotient is ≤ 2n·10⁸,
    * back inside BIGINT for any feasible corpus). The second ÷n is
    * what makes |c| ≤ 2·10⁸ INDEPENDENT of n — so every downstream
    * matvec term (|c·v| ≤ 2·10¹³; 64-term sums ≤ 1.3·10¹⁵) stays in
    * BIGINT at any corpus size, not just harness SFs. The oracle's
    * generated `c` CTE replays the identical two-step HUGEINT form.
    */
  private def centeredScatter(nDf: DataFrame, s: DataFrame,
                              p: DataFrame): DataFrame =
    p.join(broadcast(s.select(col("i"), col("s").as("si"))), "i")
      .join(broadcast(s.select(col("i").as("j"), col("s").as("sj"))), "j")
      .crossJoin(broadcast(nDf))
      .withColumn("m", expr(
        "CAST(n AS DECIMAL(38,0)) * p - CAST(si AS DECIMAL(38,0)) * sj"))
      .withColumn("m1", expr(
        "CAST(CASE WHEN m < 0 THEN -((-m) div n) " +
        "ELSE m div n END AS BIGINT)"))
      .select(col("i"), col("j"), expr(
        "CASE WHEN m1 < 0 THEN -((-m1) div n) ELSE m1 div n END").as("c"))

  /** The shared fixed-point power iteration (exact BigInt matvec +
    * integer ∞-norm rescale), also run against the DEFLATED matrix for
    * the second component.
    */
  private def powerIterate(cm: Array[(Long, Long, BigInt)],
                           iters: Int): Map[Long, BigInt] = {
    val dimIds = cm.map(_._1).distinct.sorted
    var v: Map[Long, BigInt] = dimIds.map(_ -> BigInt(PcaVs)).toMap
    for (_ <- 1 to iters) {
      val mv: Map[Long, BigInt] = cm.groupBy(_._1).map { case (i, rows) =>
        i -> rows.foldLeft(BigInt(0)) { case (acc, (_, j, cij)) =>
          acc + cij * v(j)
        }
      }
      val mx = mv.values.map(_.abs).max
      val d = mx / PcaVs + 1
      v = mv.map { case (i, m) =>
        i -> (if (m < 0) -((-m) / d) else m / d)
      }
    }
    v
  }

  /** Top TWO principal components by exact integer deflation: v1 from
    * the scatter power iteration, then c₂ᵢⱼ = cᵢⱼ − ⌊λ̂·v1ᵢ·v1ⱼ⌋ with
    * λ̂ = (v1ᵀCv1)/(v1ᵀv1)² applied as one sign-split magnitude
    * division per entry — the rank-1 Hotelling deflation, every
    * quantity an exact integer (BigInt driver-side; the oracle replays
    * it in HUGEINT — products stay under 10³⁶), so v2 hash-matches a
    * SQL replay like v1. Per-entry floor loss ≤ 1 unit on ~10¹¹-scale
    * entries; the spec pins recovery of a planted second axis.
    * Returns (dim, v1, v2) on the ±10⁵ grid.
    */
  def pcaTop2Components(embeddings: DataFrame, iters: Int): DataFrame = {
    val partials = scatterPartials(embeddings)
    val spark = partials.sparkSession
    val nDf = partials.filter(col("kind") === "n").agg(sum("v").as("n"))
    val s = partials.filter(col("kind") === "s")
      .groupBy("i").agg(sum("v").as("s"))
    val p = partials.filter(col("kind") === "p")
      .groupBy("i", "j").agg(sum("v").as("p"))
    val c = centeredScatter(nDf, s, p)
    val cm = c.collect().map(r => (r.getLong(0), r.getLong(1),
                                   BigInt(r.getLong(2))))
    val v1 = powerIterate(cm, iters)
    val bigP = cm.foldLeft(BigInt(0)) { case (acc, (i, j, cij)) =>
      acc + cij * v1(i) * v1(j)
    }
    val q = v1.values.foldLeft(BigInt(0))((a, x) => a + x * x)
    val den = q * q
    val cm2 = cm.map { case (i, j, cij) =>
      val num = bigP * v1(i) * v1(j)
      val adj = if (num < 0) -((-num) / den) else num / den
      (i, j, cij - adj)
    }
    val v2 = powerIterate(cm2, iters)
    import spark.implicits._
    v1.keySet.toSeq.sorted
      .map(i => (i, v1(i).toLong, v2(i).toLong))
      .toDF("dim", "v1", "v2")
  }
}
