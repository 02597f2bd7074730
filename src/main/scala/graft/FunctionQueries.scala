package graft

import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY.md §2.8, F1-F11): date parts, strings,
  * regex, conditionals, math, arrays (incl. higher-order functions), maps,
  * JSON, hashing. All built-ins — fully codegen'd, no UDFs (the reference
  * has no UDF facility either; its only scalar transform is the timestamp
  * scaling covered by q_ts_convert).
  *
  * Computed integer outputs are cast to long to match DuckDB's BIGINT
  * results (year/size/etc return INT in Spark, BIGINT in DuckDB).
  */
object FunctionQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // F3: date parts / truncation.
    "q_date_parts" -> ((s, dir) =>
      Tables(s, dir, "events")
        .select(col("event_id"),
                year(col("ts")).cast("long").as("y"),
                month(col("ts")).cast("long").as("mo"),
                dayofmonth(col("ts")).cast("long").as("d"),
                hour(col("ts")).cast("long").as("h"),
                minute(col("ts")).cast("long").as("mi"),
                quarter(col("ts")).cast("long").as("q"),
                dayofweek(col("ts")).cast("long").as("dow"))
        .orderBy("event_id")),

    // F4: string functions.
    "q_string_funcs" -> ((s, dir) =>
      Tables(s, dir, "customer")
        .select(col("c_custkey"),
                upper(col("c_name")).as("u"),
                lower(col("c_mktsegment")).as("l"),
                substring(col("c_name"), 10, 4).as("sub"),
                length(col("c_name")).cast("long").as("len"),
                concat(col("c_name"), lit("-"), col("c_mktsegment")).as("cc"),
                regexp_replace(col("c_name"), lit("Customer#"), lit("C"))
                  .as("rep"),
                lpad(col("c_custkey").cast("string"), 8, "0").as("pad"))
        .orderBy("c_custkey")),

    // F5: pattern matching (LIKE / regex extract / regex replace).
    "q_regex" -> ((s, dir) =>
      Tables(s, dir, "customer")
        .select(col("c_custkey"),
                regexp_extract(col("c_name"), "([0-9]+)$", 1).as("digits"),
                regexp_replace(col("c_mktsegment"), "[AEIOU]", "_")
                  .as("devowel"),
                col("c_name").like("%0").as("like0"),
                col("c_name").rlike("00$").as("rx00"))
        .orderBy("c_custkey")),

    // F6: conditionals (CASE WHEN / coalesce / nullif).
    "q_case_when" -> ((s, dir) =>
      Tables(s, dir, "customer")
        .select(col("c_custkey"),
                when(col("c_acctbal") >= 7500, "platinum")
                  .when(col("c_acctbal") >= 5000, "gold")
                  .when(col("c_acctbal") >= 2500, "silver")
                  .otherwise("bronze").as("tier"),
                coalesce(nullif(col("c_mktsegment"), lit("BUILDING")),
                         lit("OTHER")).as("seg2"))
        .orderBy("c_custkey")),

    // F7: math functions.
    "q_math_funcs" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
                round(col("l_extendedprice"), 1).as("r1"),
                floor(col("l_discount") * 100).as("fl"),
                ceil(col("l_discount") * 100).as("ce"),
                abs(col("l_quantity") - 25).as("ab"),
                round(sqrt(col("l_quantity")), 4).as("sq"),
                round(pow(col("l_discount"), 2), 6).as("pw"),
                (col("l_orderkey") % 7).as("md"))
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "r1")),

    // F7b: bitwise operators on integer keys (ClickHouse bitAnd/bitOr/
    // bitShift* analogs).
    "q_bit_ops" -> ((s, dir) =>
      Tables(s, dir, "events")
        .select(col("event_id"),
                col("event_id").bitwiseAND(lit(255L)).as("b_and"),
                col("event_id").bitwiseOR(lit(16L)).as("b_or"),
                col("event_id").bitwiseXOR(col("user_id")).as("b_xor"),
                shiftleft(col("event_id"), 2).as("b_shl"),
                shiftright(col("event_id"), 1).as("b_shr"))
        .orderBy("event_id")),

    // F8: array basics on the embeddings table.
    "q_array_funcs" -> ((s, dir) =>
      Tables(s, dir, "embeddings")
        .select(col("vec_id"),
                size(col("embedding")).cast("long").as("dim"),
                element_at(col("embedding"), 1).cast("double").as("e0"),
                array_max(col("embedding")).cast("double").as("emax"),
                array_min(col("embedding")).cast("double").as("emin"))
        .orderBy("vec_id")),

    // F8: higher-order functions (transform / aggregate / filter).
    "q_array_hof" -> ((s, dir) =>
      Tables(s, dir, "embeddings")
        .select(col("vec_id"),
                (round(aggregate(transform(col("embedding"),
                                           x => x.cast("double") * 2),
                                 lit(0.0), (acc, x) => acc + x), 6) + lit(0.0))
                  .as("s2"),
                size(filter(col("embedding"), x => x > 0)).cast("long")
                  .as("npos"))
        .orderBy("vec_id")),

    // F9: map construction and element access.
    "q_map_funcs" -> ((s, dir) =>
      Tables(s, dir, "events")
        .withColumn("m", map(lit("type"), col("event_type"),
                             lit("props"), col("props")))
        .select(col("event_id"),
                element_at(col("m"), "type").as("m_type"),
                size(col("m")).cast("long").as("m_n"))
        .orderBy("event_id")),

    // F10: JSON extraction from the events.props string column.
    "q_json_extract" -> ((s, dir) =>
      Tables(s, dir, "events")
        .select(col("event_id"),
                get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id")),

    // F11: cryptographic hashes (dedup keys / fingerprints).
    "q_hash" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"),
                md5(col("text")).as("h_md5"),
                sha2(col("text"), 256).as("h_sha"))
        .orderBy("doc_id")),

    // F11: xxhash64 — Spark-native 64-bit hash with no DuckDB equivalent,
    // oracled through two derived invariants instead of raw digests:
    // (a) injectivity on the corpus (distinct hashes == distinct texts —
    // a real 64-bit collision at this scale is ~1e-9), and (b) a pinned
    // known-answer vector (XXH64("graft", seed=42), computed from the
    // published reference algorithm) that breaks if the hash
    // implementation ever drifts.
    "q_hash_xx" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .agg(count(lit(1)).as("n_rows"),
             countDistinct(col("text")).as("n_distinct_text"),
             countDistinct(xxhash64(col("text"))).as("n_distinct_hash"))
        .withColumn("pin", xxhash64(lit("graft")))),

    // F3: date arithmetic (interval add, calendar-month clamp, day diff,
    // month end).
    "q_date_arith" -> ((s, dir) =>
      Tables(s, dir, "events")
        .select(col("event_id"),
                (col("ts") + expr("INTERVAL 3 DAYS")).as("plus3d"),
                (col("ts") + expr("INTERVAL 1 MONTH")).as("plus1mo"),
                datediff(lit("2024-02-01").cast("date"), col("ts"))
                  .cast("long").as("days_to_feb"),
                last_day(col("ts")).as("month_end"))
        .orderBy("event_id")),

    // F10b: VARIANT semi-structured type (Spark 4) — parse once into the
    // binary variant encoding, extract typed fields without re-parsing
    // (the ClickHouse JSON-type analog; at 100 TB this is the difference
    // between one parse at ingest and a parse per query). Values must
    // match q_json_extract's string-path output → oracle reuses that
    // formulation.
    "q_variant" -> ((s, dir) =>
      Tables(s, dir, "events")
        .withColumn("v", parse_json(col("props")))
        .select(col("event_id"),
                try_variant_get(col("v"), "$.k", "long").as("k"))
        .orderBy("event_id")),

    // UDTF surface: posexplode (generator with ordinality).
    "q_posexplode" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .filter(col("doc_id") < 20)
        .select(col("doc_id"),
                posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
        .withColumn("pos", col("pos").cast("long"))
        .orderBy("doc_id", "pos")),

    // F15: JSON array extraction (ClickHouse JSONExtractArrayRaw +
    // ARRAY JOIN): parse a synthesized JSON document once with
    // from_json (schema'd, codegen'd — the parse-at-ingest discipline),
    // then generate one row per array element with posexplode.
    "q_json_array" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"),
                concat(lit("{\"tags\":[\""), col("lang"), lit("\",\""),
                       col("source"), lit("\"],\"n\":"), col("n_chars"),
                       lit("}")).as("j"))
        .select(col("doc_id"),
                from_json(col("j"), lit("tags ARRAY<STRING>, n BIGINT"))
                  .as("p"))
        .select(col("doc_id"), col("p.n").as("n"),
                posexplode(col("p.tags")).as(Seq("pos", "tag")))
        .withColumn("pos", col("pos").cast("long"))
        .orderBy("doc_id", "pos")),

    // F13: IPv4 family (ClickHouse IPv4NumToString / IPv4StringToNum /
    // isIPAddressInRange): shift/mask octet surgery, string round-trip,
    // RFC-1918 predicate, /24 prefix — all codegen'd integer ops over a
    // deterministically synthesized address per event.
    "q_ip_funcs" -> ((s, dir) =>
      Tables(s, dir, "events")
        .select(col("event_id"),
                pmod(col("event_id") * 2654435761L, lit(4294967296L))
                  .as("ip_num"))
        .select(col("event_id"), col("ip_num"),
                Functions.ipv4NumToString(col("ip_num")).as("ip_str"),
                Functions.ipv4StringToNum(
                  Functions.ipv4NumToString(col("ip_num")))
                  .as("roundtrip"),
                Functions.ipv4IsPrivate(col("ip_num")).cast("long")
                  .as("is_private"),
                concat(Functions.ipv4NumToString(
                         shiftleft(shiftright(col("ip_num"), 8), 8)),
                       lit("/24")).as("cidr24"))
        .orderBy("event_id")),

    // F14: geo family — haversine great-circle distance
    // ([[Functions.haversineKm]]) and an 8-character geohash
    // ([[Functions.geohashEncode]]: 2×20-bit quantize → bit-interleave
    // fold → base-32, exact power-of-two arithmetic so the SQL oracle
    // matches bit-for-bit) over deterministic synthetic coordinates.
    "q_geo_funcs" -> ((s, dir) =>
      Tables(s, dir, "events")
        .select(col("event_id"),
                (pmod(col("event_id") * 37, lit(17000L)).cast("double")
                   / 100.0 - 85.0).as("lat"),
                (pmod(col("event_id") * 73, lit(35900L)).cast("double")
                   / 100.0 - 179.5).as("lon"))
        .select(col("event_id"), col("lat"), col("lon"),
                round(Functions.haversineKm(col("lat"), col("lon"),
                                            lit(48.85), lit(2.35)), 4)
                  .as("dist_paris_km"),
                Functions.geohashEncode(col("lat"), col("lon"))
                  .as("geohash8"))
        .orderBy("event_id")),

    // F12: URL decomposition (the ClickHouse URL-function family —
    // protocol/domain/domainWithoutWWW/topLevelDomain/path/queryString/
    // extractURLParameter) via `parse_url` — a codegen'd built-in, one
    // projection, no UDF. URLs are synthesized deterministically from
    // the documents table (the per-domain-cap curation input shape).
    "q_url_funcs" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"),
                concat(lit("https://www."), col("source"),
                       lit(".example.com/"), col("lang"), lit("/doc/"),
                       col("doc_id"), lit("?page="),
                       pmod(col("doc_id"), lit(10)), lit("&ref="),
                       col("source")).as("url"))
        .select(col("doc_id"),
                parse_url(col("url"), lit("PROTOCOL")).as("proto"),
                parse_url(col("url"), lit("HOST")).as("host"),
                regexp_replace(parse_url(col("url"), lit("HOST")),
                               "^www\\.", "").as("domain_no_www"),
                regexp_extract(parse_url(col("url"), lit("HOST")),
                               "\\.([^.]+)$", 1).as("tld"),
                parse_url(col("url"), lit("PATH")).as("path"),
                parse_url(col("url"), lit("QUERY")).as("query"),
                parse_url(col("url"), lit("QUERY"), lit("page"))
                  .cast("long").as("page"))
        .orderBy("doc_id")),

    // F8: array SET ops (arrayIntersect / arrayUnion-distinct /
    // arrayExcept) between each order's odd-line and even-line quantity
    // sets — one conditional-collect hash aggregate builds both bounded
    // arrays, the set ops are codegen'd built-ins, every output sorted +
    // distinct so collection order is irrelevant.
    "q_array_set_ops" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
                expr("CAST(round(l_quantity) AS BIGINT)").as("q"))
        .groupBy("l_orderkey")
        .agg(collect_list(when(pmod(col("l_linenumber"), lit(2)) === 1,
                               col("q"))).as("a"),
             collect_list(when(pmod(col("l_linenumber"), lit(2)) === 0,
                               col("q"))).as("b"))
        .select(col("l_orderkey"),
                // Serialized to ","-joined strings (the q_agg_collect
                // convention) so the driver comparator can hash them.
                expr("array_join(transform(array_sort(" +
                  "array_intersect(a, b)), x -> CAST(x AS STRING)), ',')")
                  .as("inter"),
                expr("array_join(transform(array_sort(" +
                  "array_union(a, b)), x -> CAST(x AS STRING)), ',')")
                  .as("uni"),
                expr("array_join(transform(array_sort(" +
                  "array_except(a, b)), x -> CAST(x AS STRING)), ',')")
                  .as("exc"))
        .orderBy("l_orderkey")),

    // ClickHouse arrayCumSum / arrayDifference / arrayCompact over the
    // per-order quantity sequence (ordered by line number; quantities
    // pre-summed per (order, line) so the sequence key is unique and
    // every derived list is deterministic). TPC-H bounds an order to 7
    // lineitems, so the per-group buffer is constant-bounded — the HOFs
    // run codegen'd over a tiny array. The DuckDB oracle rebuilds the
    // same lists from window prefix sums instead of lambdas: two
    // independent formulations, one hash-checked contract.
    "q_array_seq" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
                expr("CAST(round(l_quantity) AS BIGINT)").as("q0"))
        .groupBy("l_orderkey", "l_linenumber")
        .agg(sum("q0").as("q"))
        .groupBy("l_orderkey")
        .agg(expr("transform(array_sort(collect_list(" +
               "struct(l_linenumber, q))), x -> x.q)").as("qs"))
        .select(col("l_orderkey"), col("qs"),
          expr("transform(qs, (x, i) -> aggregate(slice(qs, 1, i + 1), " +
            "CAST(0 AS BIGINT), (a, b) -> a + b))").as("cum"),
          expr("transform(qs, (x, i) -> x - coalesce(get(qs, i - 1), x))")
            .as("diff"),
          expr("filter(qs, (x, i) -> i = 0 OR x != get(qs, i - 1))")
            .as("compact"))
        // Serialized to ","-joined strings (the q_agg_collect
        // convention) so the driver comparator can hash the columns.
        .select(col("l_orderkey"),
          expr("array_join(transform(qs, x -> CAST(x AS STRING)), ',')")
            .as("qs"),
          expr("array_join(transform(cum, x -> CAST(x AS STRING)), ',')")
            .as("cum"),
          expr("array_join(transform(diff, x -> CAST(x AS STRING)), ',')")
            .as("diff"),
          expr("array_join(transform(compact, x -> CAST(x AS STRING)), " +
            "',')").as("compact"))
        .orderBy("l_orderkey"))
  )

  val oracles: Map[String, String] = Map(
    // Explicit distinct/filter/sort formulations (portable across
    // DuckDB versions without list_intersect/list_union).
    "q_array_set_ops" ->
      """WITH s AS (
        |  SELECT l_orderkey AS k,
        |    coalesce(list(CAST(round(l_quantity) AS BIGINT))
        |      FILTER (WHERE l_linenumber % 2 = 1), []) AS a,
        |    coalesce(list(CAST(round(l_quantity) AS BIGINT))
        |      FILTER (WHERE l_linenumber % 2 = 0), []) AS b
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT k AS l_orderkey,
        |  coalesce(array_to_string(list_transform(
        |    list_sort(list_filter(list_distinct(a),
        |                          x -> list_contains(b, x))),
        |    x -> CAST(x AS VARCHAR)), ','), '') AS inter,
        |  coalesce(array_to_string(list_transform(
        |    list_sort(list_distinct(list_concat(a, b))),
        |    x -> CAST(x AS VARCHAR)), ','), '') AS uni,
        |  coalesce(array_to_string(list_transform(
        |    list_sort(list_filter(list_distinct(a),
        |                          x -> NOT list_contains(b, x))),
        |    x -> CAST(x AS VARCHAR)), ','), '') AS exc
        |FROM s ORDER BY l_orderkey NULLS FIRST""".stripMargin,

    "q_array_seq" ->
      """WITH s0 AS (
        |  SELECT l_orderkey AS k, l_linenumber AS ln,
        |    CAST(round(l_quantity) AS BIGINT) AS q0
        |  FROM lineitem),
        |s AS (SELECT k, ln, CAST(sum(q0) AS BIGINT) AS q
        |      FROM s0 GROUP BY k, ln),
        |w AS (
        |  SELECT k, ln, q,
        |    CAST(sum(q) OVER (PARTITION BY k ORDER BY ln
        |                      ROWS BETWEEN UNBOUNDED PRECEDING
        |                      AND CURRENT ROW) AS BIGINT) AS cs,
        |    lag(q) OVER (PARTITION BY k ORDER BY ln) AS pq
        |  FROM s)
        |SELECT k AS l_orderkey,
        |  string_agg(CAST(q AS VARCHAR), ',' ORDER BY ln) AS qs,
        |  string_agg(CAST(cs AS VARCHAR), ',' ORDER BY ln) AS cum,
        |  string_agg(CAST(q - coalesce(pq, q) AS VARCHAR), ','
        |             ORDER BY ln) AS diff,
        |  string_agg(CAST(q AS VARCHAR), ',' ORDER BY ln)
        |    FILTER (WHERE pq IS NULL OR q <> pq) AS compact
        |FROM w GROUP BY k ORDER BY l_orderkey NULLS FIRST""".stripMargin,

    "q_date_parts" ->
      """SELECT event_id, year(ts) AS y, month(ts) AS mo, day(ts) AS d,
        |  hour(ts) AS h, minute(ts) AS mi, quarter(ts) AS q,
        |  dayofweek(ts) + 1 AS dow
        |FROM events ORDER BY event_id NULLS FIRST""".stripMargin,

    "q_string_funcs" ->
      """SELECT c_custkey, upper(c_name) AS u, lower(c_mktsegment) AS l,
        |  substring(c_name, 10, 4) AS sub,
        |  CAST(length(c_name) AS BIGINT) AS len,
        |  c_name || '-' || c_mktsegment AS cc,
        |  regexp_replace(c_name, 'Customer#', 'C') AS rep,
        |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS pad
        |FROM customer ORDER BY c_custkey NULLS FIRST""".stripMargin,

    "q_regex" ->
      """SELECT c_custkey,
        |  regexp_extract(c_name, '([0-9]+)$', 1) AS digits,
        |  regexp_replace(c_mktsegment, '[AEIOU]', '_', 'g') AS devowel,
        |  c_name LIKE '%0' AS like0,
        |  regexp_matches(c_name, '00$') AS rx00
        |FROM customer ORDER BY c_custkey NULLS FIRST""".stripMargin,

    "q_case_when" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal >= 7500 THEN 'platinum'
        |       WHEN c_acctbal >= 5000 THEN 'gold'
        |       WHEN c_acctbal >= 2500 THEN 'silver'
        |       ELSE 'bronze' END AS tier,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg2
        |FROM customer ORDER BY c_custkey NULLS FIRST""".stripMargin,

    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  round(l_extendedprice, 1) AS r1,
        |  CAST(floor(l_discount * 100) AS BIGINT) AS fl,
        |  CAST(ceil(l_discount * 100) AS BIGINT) AS ce,
        |  abs(l_quantity - 25) AS ab,
        |  round(sqrt(l_quantity), 4) AS sq,
        |  round(pow(l_discount, 2), 6) AS pw,
        |  l_orderkey % 7 AS md
        |FROM lineitem
        |ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST,
        |         l_quantity NULLS FIRST, r1 NULLS FIRST""".stripMargin,

    "q_bit_ops" ->
      """SELECT event_id,
        |  event_id & 255 AS b_and,
        |  event_id | 16 AS b_or,
        |  xor(event_id, user_id) AS b_xor,
        |  event_id << 2 AS b_shl,
        |  event_id >> 1 AS b_shr
        |FROM events ORDER BY event_id NULLS FIRST""".stripMargin,

    "q_array_funcs" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
        |  CAST(embedding[1] AS DOUBLE) AS e0,
        |  CAST(list_max(embedding) AS DOUBLE) AS emax,
        |  CAST(list_min(embedding) AS DOUBLE) AS emin
        |FROM embeddings ORDER BY vec_id NULLS FIRST""".stripMargin,

    "q_array_hof" ->
      """SELECT vec_id,
        |  round(list_aggregate(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * 2), 'sum'), 6) + 0 AS s2,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS npos
        |FROM embeddings ORDER BY vec_id NULLS FIRST""".stripMargin,

    "q_map_funcs" ->
      """SELECT event_id, event_type AS m_type, CAST(2 AS BIGINT) AS m_n
        |FROM events ORDER BY event_id NULLS FIRST""".stripMargin,

    "q_json_extract" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id NULLS FIRST""".stripMargin,

    "q_hash" ->
      """SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha
        |FROM documents ORDER BY doc_id NULLS FIRST""".stripMargin,

    // DuckDB has no XXH64; verify the derived invariants. The pin constant
    // is XXH64("graft", seed=42) as a signed 64-bit integer, derived from
    // the public xxHash specification.
    "q_hash_xx" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_text,
        |  CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_hash,
        |  CAST(-4815631219266125053 AS BIGINT) AS pin
        |FROM documents""".stripMargin,

    "q_date_arith" ->
      """SELECT event_id,
        |  ts + INTERVAL 3 DAY AS plus3d,
        |  ts + INTERVAL 1 MONTH AS plus1mo,
        |  CAST(date_diff('day', CAST(ts AS DATE), DATE '2024-02-01')
        |       AS BIGINT) AS days_to_feb,
        |  last_day(CAST(ts AS DATE)) AS month_end
        |FROM events ORDER BY event_id NULLS FIRST""".stripMargin,

    "q_variant" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id NULLS FIRST""".stripMargin,

    "q_posexplode" ->
      """SELECT doc_id, unnest(range(0, len(string_split(text, ' ')))) AS pos,
        |  unnest(string_split(text, ' ')) AS token
        |FROM documents WHERE doc_id < 20
        |ORDER BY doc_id NULLS FIRST, pos NULLS FIRST""".stripMargin,

    "q_json_array" ->
      """WITH j AS (
        |  SELECT doc_id,
        |    '{"tags":["' || lang || '","' || source || '"],"n":' ||
        |    CAST(n_chars AS VARCHAR) || '}' AS j
        |  FROM documents)
        |SELECT doc_id, CAST(json_extract(j, '$.n') AS BIGINT) AS n,
        |  CAST(p AS BIGINT) AS pos,
        |  json_extract_string(j, '$.tags[' || CAST(p AS VARCHAR) || ']')
        |    AS tag
        |FROM j, (SELECT unnest(range(0, 2)) AS p)
        |ORDER BY doc_id NULLS FIRST, pos NULLS FIRST""".stripMargin,

    "q_ip_funcs" ->
      """WITH i AS (
        |  SELECT event_id,
        |    (event_id * 2654435761) % 4294967296 AS ip_num
        |  FROM events),
        |s AS (
        |  SELECT event_id, ip_num,
        |    CAST((ip_num >> 24) & 255 AS VARCHAR) || '.' ||
        |    CAST((ip_num >> 16) & 255 AS VARCHAR) || '.' ||
        |    CAST((ip_num >> 8) & 255 AS VARCHAR) || '.' ||
        |    CAST(ip_num & 255 AS VARCHAR) AS ip_str
        |  FROM i)
        |SELECT event_id, ip_num, ip_str,
        |  CAST(string_split(ip_str, '.')[1] AS BIGINT) * 16777216 +
        |  CAST(string_split(ip_str, '.')[2] AS BIGINT) * 65536 +
        |  CAST(string_split(ip_str, '.')[3] AS BIGINT) * 256 +
        |  CAST(string_split(ip_str, '.')[4] AS BIGINT) AS roundtrip,
        |  CAST(((ip_num >> 24) & 255) = 10 OR
        |    (((ip_num >> 24) & 255) = 172 AND
        |     ((ip_num >> 16) & 255) BETWEEN 16 AND 31) OR
        |    (((ip_num >> 24) & 255) = 192 AND
        |     ((ip_num >> 16) & 255) = 168) AS BIGINT) AS is_private,
        |  CAST((ip_num >> 24) & 255 AS VARCHAR) || '.' ||
        |  CAST((ip_num >> 16) & 255 AS VARCHAR) || '.' ||
        |  CAST((ip_num >> 8) & 255 AS VARCHAR) || '.0/24' AS cidr24
        |FROM s ORDER BY event_id NULLS FIRST""".stripMargin,

    // Mirrors geohashEncode digit for digit: floor-division bit
    // extraction over exact power-of-two divisors.
    "q_geo_funcs" ->
      """WITH c AS (
        |  SELECT event_id,
        |    CAST((event_id * 37) % 17000 AS DOUBLE) / 100.0 - 85.0
        |      AS lat,
        |    CAST((event_id * 73) % 35900 AS DOUBLE) / 100.0 - 179.5
        |      AS lon
        |  FROM events),
        |q AS (
        |  SELECT event_id, lat, lon,
        |    least(1048575, CAST(floor((lat + 90.0) / 180.0 * 1048576.0)
        |      AS BIGINT)) AS ilat,
        |    least(1048575, CAST(floor((lon + 180.0) / 360.0 * 1048576.0)
        |      AS BIGINT)) AS ilon
        |  FROM c),
        |h AS (
        |  SELECT event_id, lat, lon,
        |    CAST(list_sum(list_transform(range(0, 20), i ->
        |      (CAST(floor(ilon / pow(2, 19 - i)) AS BIGINT) % 2)
        |        * CAST(pow(2, 39 - 2*i) AS BIGINT) +
        |      (CAST(floor(ilat / pow(2, 19 - i)) AS BIGINT) % 2)
        |        * CAST(pow(2, 38 - 2*i) AS BIGINT))) AS BIGINT) AS hh
        |  FROM q)
        |SELECT event_id, lat, lon,
        |  round(2.0 * 6371.0 * asin(sqrt(
        |    pow(sin(radians(48.85 - lat) / 2), 2) +
        |    cos(radians(lat)) * cos(radians(48.85)) *
        |    pow(sin(radians(2.35 - lon) / 2), 2))), 4) AS dist_paris_km,
        |  array_to_string(list_transform(range(0, 8), k ->
        |    substring('0123456789bcdefghjkmnpqrstuvwxyz',
        |      CAST(CAST(floor(hh / pow(2, 35 - 5*k)) AS BIGINT) % 32
        |        + 1 AS INT), 1)), '') AS geohash8
        |FROM h ORDER BY event_id NULLS FIRST""".stripMargin,

    "q_url_funcs" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://www.' || source || '.example.com/' || lang ||
        |    '/doc/' || CAST(doc_id AS VARCHAR) || '?page=' ||
        |    CAST(doc_id % 10 AS VARCHAR) || '&ref=' || source AS url
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, url,
        |    regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host
        |  FROM u)
        |SELECT doc_id,
        |  regexp_extract(url, '^([a-z]+)://', 1) AS proto,
        |  host,
        |  regexp_replace(host, '^www\.', '') AS domain_no_www,
        |  regexp_extract(host, '\.([^.]+)$', 1) AS tld,
        |  regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
        |  regexp_extract(url, '\?([^#]*)', 1) AS query,
        |  CAST(regexp_extract(url, '[?&]page=([^&#]*)', 1) AS BIGINT)
        |    AS page
        |FROM h ORDER BY doc_id NULLS FIRST""".stripMargin
  )
}
