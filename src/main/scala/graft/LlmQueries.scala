package graft

import org.apache.spark.sql.functions._

/** LLM-pipeline query pack (SURVEY.md §2.10). Oracle-checked where DuckDB
  * can express the computation; the probabilistic operators (MinHash-LSH,
  * SimHash, hyperplane ANN) are rows-only here and accuracy-tested against
  * their exact counterparts in LlmSpec.
  */
object LlmQueries extends QueryPack {

  private def queryVec(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(s, dir, "embeddings").filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))

  val queries: Map[String, Q] = Map(
    // L1: exact dedup by content hash — keep the lowest doc_id per hash.
    "q_dedup_exact" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .groupBy(md5(col("text")).as("h"))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("h")),

    // L2a: exact 3-gram Jaccard near-dup pairs (same language).
    "q_dedup_ngram_jaccard" -> ((s, dir) =>
      LlmOps.ngramJaccardPairs(Tables(s, dir, "documents"), "doc_id", "text",
                               "lang", 3, 0.2)
        .orderBy("a", "b")),

    // L2b: MinHash + banded LSH candidates, exact-Jaccard verified
    // (rows-only; recall vs q_dedup_ngram_jaccard asserted in LlmSpec).
    "q_dedup_minhash" -> ((s, dir) =>
      LlmOps.minhashNearDupPairs(Tables(s, dir, "documents"), "doc_id",
                                 "text", 3, 32, 16, 0.2)
        .orderBy("a", "b")),

    // L2c: SimHash near-dup pairs (rows-only).
    "q_dedup_simhash" -> ((s, dir) =>
      LlmOps.simhashNearDupPairs(Tables(s, dir, "documents"), "doc_id",
                                 "text", 10)
        .orderBy("a", "b")),

    // L2d: embedding-cosine near-dup pairs.
    "q_dedup_embed" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val a = e.select(col("vec_id").as("a"), col("embedding").as("ea"))
      val b = e.select(col("vec_id").as("b"), col("embedding").as("eb"))
      a.join(b, col("a") < col("b"))
        .withColumn("sim_raw", Functions.cosine(col("ea"), col("eb")))
        .filter(col("sim_raw") >= 0.5)
        .select(col("a"), col("b"), round(col("sim_raw"), 4).as("sim"))
        .orderBy("a", "b")
    }),

    // L2e: near-dup pairs resolved into duplicate clusters (canonical
    // survivor = min doc id per connected component).
    "q_dedup_components" -> ((s, dir) =>
      LlmOps.connectedComponents(
        LlmOps.ngramJaccardPairs(Tables(s, dir, "documents"), "doc_id",
                                 "text", "lang", 3, 0.2))
        .orderBy("node")),

    // L6b: TF-IDF over a deterministic doc slice.
    "q_text_tfidf" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val tf = docs.select(col("doc_id"),
                           explode(LlmOps.tokens(col("text"))).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val df_ = tf.groupBy("token")
        .agg(countDistinct(col("doc_id")).as("df"))
      tf.join(df_, "token").crossJoin(broadcast(n))
        .filter(col("doc_id") < 10)
        .select(col("doc_id"), col("token"),
                round(col("tf") *
                      log(col("n_docs").cast("double") / col("df")), 4)
                  .as("tfidf"))
        .orderBy("doc_id", "token")
    }),

    // L3: cosine similarity of every vector vs a broadcast query vector.
    "q_cosine_sim" -> ((s, dir) =>
      Tables(s, dir, "embeddings")
        .crossJoin(broadcast(queryVec(s, dir)))
        .select(col("vec_id"),
                (round(Functions.cosine(col("embedding"), col("q_emb")), 4)
                   + lit(0.0)).as("sim"))
        .orderBy("vec_id")),

    // L4: brute-force cosine top-k (the exact ANN baseline).
    "q_simsearch_topk" -> ((s, dir) =>
      LlmOps.cosineTopK(Tables(s, dir, "embeddings"), queryVec(s, dir), 10)
        .orderBy("vec_id")),

    // L4b: LSH-bucketed ANN (rows-only; recall asserted in LlmSpec).
    "q_simsearch_lsh" -> ((s, dir) =>
      LlmOps.annLshTopK(Tables(s, dir, "embeddings"), queryVec(s, dir), 4, 10)
        .orderBy("vec_id")),

    // L4c: IVF-style ANN via centroid probe (rows-only; see LlmSpec).
    "q_simsearch_ivf" -> ((s, dir) =>
      LlmOps.annIvfTopK(Tables(s, dir, "embeddings"), queryVec(s, dir), 64, 10)
        .orderBy("vec_id")),

    // L5: per-document token/char counts.
    "q_text_tokens" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"),
                size(LlmOps.tokens(col("text"))).cast("long").as("n_tokens"),
                length(col("text")).cast("long").as("n_chars_calc"),
                col("n_chars"))
        .orderBy("doc_id")),

    // L5: corpus stats by language slice.
    "q_text_lang_stats" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .withColumn("n_tok", size(LlmOps.tokens(col("text"))).cast("long"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
             round(avg("n_tok"), 4).as("avg_tokens"),
             sum("n_chars").as("sum_chars"))
        .orderBy("lang")),

    // L6: term-frequency table (top 20 tokens).
    "q_text_tf" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .select(explode(LlmOps.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc_nulls_last, col("token"))
        .limit(20)),

    // L5: quality scoring — token count, mean token length, stopword ratio.
    "q_text_quality" -> ((s, dir) => {
      val toks = LlmOps.tokens(col("text"))
      val stop = array(Seq("the", "a", "data", "row", "query").map(lit): _*)
      Tables(s, dir, "documents")
        .select(col("doc_id"),
                size(toks).cast("long").as("n_tok"),
                round(aggregate(toks, lit(0L), (acc, t) => acc + length(t))
                        .cast("double") / size(toks), 4).as("avg_tok_len"),
                round(size(filter(toks, t => array_contains(stop, t)))
                        .cast("double") / size(toks), 4).as("stop_ratio"))
        .orderBy("doc_id")
    }),

    // L5: n-gram-marker language ID (rows-only; heuristic demo — the
    // synthetic corpus shares one vocabulary across its lang labels).
    "q_lang_id" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
                LlmOps.langId(LlmOps.tokens(col("text"))).as("pred_lang"))
        .orderBy("doc_id")),

    // L5: BPE-ish regex tokenization (letter runs / digit runs / single
    // punctuation — the pre-tokenizer shape real BPE vocabularies use).
    "q_text_bpe_tokens" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"),
                size(regexp_extract_all(lower(col("text")),
                                        lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
                  .cast("long").as("n_bpe_tokens"),
                array_join(slice(regexp_extract_all(lower(col("text")),
                  lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)), 1, 5), "|")
                  .as("head_tokens"))
        .orderBy("doc_id")),

    // L1: rolling polynomial hash over the token stream, mod a large prime
    // (order-sensitive fingerprint; ANSI-safe — every intermediate stays
    // under 2^63; no SQL-expressible fold in DuckDB → rows-only).
    "q_fingerprint_rolling" -> ((s, dir) => {
      val p = lit(1000000007L)
      Tables(s, dir, "documents")
        .select(col("doc_id"),
                aggregate(LlmOps.tokens(col("text")), lit(5381L),
                          (acc, t) => pmod(acc * 31 + pmod(xxhash64(t), p), p))
                  .as("fp_roll"))
        .orderBy("doc_id")
    }),

    // L1/F11: document fingerprints — whole-text and 8-token-prefix md5
    // over whitespace-normalized lowercase text.
    "q_fingerprint" -> ((s, dir) => {
      val norm = lower(trim(regexp_replace(col("text"), "\\s+", " ")))
      Tables(s, dir, "documents")
        .select(col("doc_id"),
                md5(norm).as("fp_full"),
                md5(concat_ws(" ",
                  slice(split(norm, " "), 1, 8))).as("fp_prefix"))
        .orderBy("doc_id")
    })
  )

  private val dotSql =
    "list_aggregate(list_transform(range(1, 65), " +
      "i -> CAST(%s[i] AS DOUBLE) * CAST(%s[i] AS DOUBLE)), 'sum')"
  private def dot(a: String, b: String) = dotSql.format(a, b)
  private def cosSql(a: String, b: String) =
    s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"

  val oracles: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY h ORDER BY h NULLS FIRST""".stripMargin,

    "q_dedup_ngram_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
        |sh AS (
        |  SELECT doc_id, lang, unnest(list_distinct(list_transform(
        |    range(1, len(tk) - 1),
        |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS s
        |  FROM toks WHERE len(tk) >= 3),
        |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
        |  FROM sh x JOIN sh y ON x.s = y.s AND x.lang = y.lang
        |    AND x.doc_id < y.doc_id
        |  GROUP BY x.doc_id, y.doc_id)
        |SELECT a, b,
        |  round(i * 1.0 / (ca.n_sh + cb.n_sh - i), 4) AS jaccard
        |FROM inter
        |JOIN cnt ca ON a = ca.doc_id JOIN cnt cb ON b = cb.doc_id
        |WHERE i * 1.0 / (ca.n_sh + cb.n_sh - i) >= 0.2
        |ORDER BY a NULLS FIRST, b NULLS FIRST""".stripMargin,

    "q_dedup_components" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
        |sh AS (
        |  SELECT doc_id, lang, unnest(list_distinct(list_transform(
        |    range(1, len(tk) - 1),
        |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS s
        |  FROM toks WHERE len(tk) >= 3),
        |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
        |  FROM sh x JOIN sh y ON x.s = y.s AND x.lang = y.lang
        |    AND x.doc_id < y.doc_id
        |  GROUP BY x.doc_id, y.doc_id),
        |pairs AS (
        |  SELECT a, b FROM inter
        |  JOIN cnt ca ON a = ca.doc_id JOIN cnt cb ON b = cb.doc_id
        |  WHERE i * 1.0 / (ca.n_sh + cb.n_sh - i) >= 0.2),
        |edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
        |reach(x, y) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT r.x, e.b FROM reach r JOIN edges e ON r.y = e.a)
        |SELECT x AS node, min(y) AS component FROM reach GROUP BY x
        |ORDER BY node NULLS FIRST""".stripMargin,

    "q_text_tfidf" ->
      """WITH tf AS (
        |  SELECT doc_id, token, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |    FROM documents) t
        |  GROUP BY doc_id, token),
        |dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM tf
        |          GROUP BY token),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT doc_id, tf.token,
        |  round(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS tfidf
        |FROM tf JOIN dfreq ON tf.token = dfreq.token CROSS JOIN n
        |WHERE doc_id < 10
        |ORDER BY doc_id NULLS FIRST, tf.token NULLS FIRST""".stripMargin,

    "q_dedup_embed" ->
      s"""SELECT x.vec_id AS a, y.vec_id AS b,
         |  round(${cosSql("x.embedding", "y.embedding")}, 4) AS sim
         |FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
         |WHERE ${cosSql("x.embedding", "y.embedding")} >= 0.5
         |ORDER BY a NULLS FIRST, b NULLS FIRST""".stripMargin,

    "q_cosine_sim" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, round(${cosSql("e.embedding", "q.qe")}, 4) + 0 AS sim
         |FROM embeddings e CROSS JOIN q
         |ORDER BY e.vec_id NULLS FIRST""".stripMargin,

    "q_simsearch_topk" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |scored AS (
         |  SELECT e.vec_id, ${cosSql("e.embedding", "q.qe")} AS sim_raw
         |  FROM embeddings e CROSS JOIN q)
         |SELECT vec_id, round(sim_raw, 4) AS sim FROM (
         |  SELECT * FROM scored
         |  ORDER BY sim_raw DESC NULLS LAST, vec_id LIMIT 10) t
         |ORDER BY vec_id NULLS FIRST""".stripMargin,

    "q_text_tokens" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars_calc, n_chars
        |FROM documents ORDER BY doc_id NULLS FIRST""".stripMargin,

    "q_text_lang_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |  round(avg(len(string_split(text, ' '))), 4) AS avg_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang ORDER BY lang NULLS FIRST""".stripMargin,

    "q_text_tf" ->
      """SELECT token, count(*) AS cnt FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
        |GROUP BY token
        |ORDER BY cnt DESC NULLS LAST, token NULLS FIRST
        |LIMIT 20""".stripMargin,

    "q_text_quality" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |  round(list_aggregate(list_transform(string_split(text, ' '),
        |    t -> CAST(length(t) AS BIGINT)), 'sum') * 1.0
        |    / len(string_split(text, ' ')), 4) AS avg_tok_len,
        |  round(len(list_filter(string_split(text, ' '),
        |    t -> list_contains(['the', 'a', 'data', 'row', 'query'], t)))
        |    * 1.0 / len(string_split(text, ' ')), 4) AS stop_ratio
        |FROM documents ORDER BY doc_id NULLS FIRST""".stripMargin,

    "q_text_bpe_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(lower(text),
        |    '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe_tokens,
        |  array_to_string(regexp_extract_all(lower(text),
        |    '[a-z]+|[0-9]+|[^a-z0-9 ]')[1:5], '|') AS head_tokens
        |FROM documents ORDER BY doc_id NULLS FIRST""".stripMargin,

    "q_fingerprint" ->
      """SELECT doc_id,
        |  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp_full,
        |  md5(array_to_string(string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')[1:8],
        |    ' ')) AS fp_prefix
        |FROM documents ORDER BY doc_id NULLS FIRST""".stripMargin
  )
}
