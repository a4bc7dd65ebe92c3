package graft

import scala.collection.immutable.ListMap

/** DuckDB-equivalent SQL for the core relational/text/dedup query board — one
  * segment of [[EntryOracles.oracleSql]], split mechanically along the
  * same EntryQueries* seams as the query board (order preserved by
  * ListMap concatenation; judge r16 task 6).
  */
private[graft] object EntryOraclesCore {
  def oracleSql: ListMap[String, String] = ListMap(
    "q_scan_project" ->
      "SELECT doc_id, source, n_chars FROM documents ORDER BY doc_id",

    "q_filter" ->
      ("SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem " +
        "WHERE l_quantity > 30 AND l_returnflag = 'R' " +
        "ORDER BY l_orderkey, l_linenumber, l_quantity"),

    "q_from_json" ->
      ("SELECT event_id, event_type, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k " +
        "FROM events ORDER BY event_id"),

    "q1_agg" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "sum(l_quantity) AS sum_qty, " +
        "sum(round(l_extendedprice*100))/100.0 AS sum_base_price, " +
        "sum(round(l_extendedprice*100) * (100 - round(l_discount*100)))/10000.0 AS sum_revenue, " +
        "sum(l_quantity)/count(*) AS avg_qty, " +
        "count(*) AS count_order " +
        "FROM lineitem GROUP BY l_returnflag, l_linestatus " +
        "ORDER BY l_returnflag, l_linestatus"),

    "q_dedup_exact" ->
      ("SELECT doc_id, n_chars FROM (" +
        "SELECT doc_id, n_chars, min(doc_id) OVER (" +
        "PARTITION BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS keep " +
        "FROM documents) WHERE doc_id = keep ORDER BY doc_id"),

    "q_vector_topk" ->
      ("SELECT query_id, match_id, CAST(rnk AS INTEGER) AS rank FROM (" +
        "SELECT q.vec_id AS query_id, c.vec_id AS match_id, " +
        "row_number() OVER (PARTITION BY q.vec_id " +
        "ORDER BY list_dot_product(q.embedding, c.embedding) DESC, c.vec_id) AS rnk " +
        "FROM embeddings q, embeddings c) WHERE rnk <= 3 " +
        "ORDER BY query_id, rank"),

    "q_vector_topk_agg" ->
      ("SELECT query_id, match_id, CAST(rnk AS INTEGER) AS rank FROM (" +
        "SELECT q.vec_id AS query_id, c.vec_id AS match_id, " +
        "row_number() OVER (PARTITION BY q.vec_id " +
        "ORDER BY list_dot_product(q.embedding, c.embedding) DESC, c.vec_id) AS rnk " +
        "FROM embeddings q, embeddings c) WHERE rnk <= 3 " +
        "ORDER BY query_id, rank"),

    "q_knn_cosine" ->
      ("SELECT query_id, match_id, CAST(rnk AS INTEGER) AS rank FROM (" +
        "SELECT q.vec_id AS query_id, c.vec_id AS match_id, " +
        "row_number() OVER (PARTITION BY q.vec_id " +
        "ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id) AS rnk " +
        "FROM embeddings q, embeddings c WHERE q.vec_id % 10 = 0) WHERE rnk <= 5 " +
        "ORDER BY query_id, rank"),

    "q_vector_filtered" ->
      ("SELECT query_id, match_id, CAST(rnk AS INTEGER) AS rank FROM (" +
        "SELECT q.vec_id AS query_id, c.vec_id AS match_id, " +
        "row_number() OVER (PARTITION BY q.vec_id " +
        "ORDER BY list_dot_product(q.embedding, c.embedding) DESC, c.vec_id) AS rnk " +
        "FROM embeddings q, embeddings c " +
        "WHERE q.vec_id % 20 = 0 AND c.label % 4 = 1) WHERE rnk <= 3 " +
        "ORDER BY query_id, rank"),

    "q_vector_radius" ->
      ("SELECT q.vec_id AS query_id, c.vec_id AS match_id, " +
        "CAST(round(list_cosine_similarity(q.embedding, c.embedding) * 1e6) AS BIGINT) AS cosine_1e6 " +
        "FROM embeddings q, embeddings c WHERE q.vec_id % 20 = 0 " +
        "AND list_cosine_similarity(q.embedding, c.embedding) >= 0.3 " +
        "ORDER BY query_id, match_id"),

    "q_sql_radius" ->
      ("SELECT q.vec_id AS query_id, c.vec_id AS match_id " +
        "FROM embeddings q, embeddings c WHERE q.vec_id % 20 = 0 " +
        "AND list_cosine_similarity(q.embedding, c.embedding) >= 0.3 " +
        "ORDER BY query_id, match_id"),

    "q_corpus_describe" ->
      ("SELECT * FROM (VALUES " +
        "('products_ext', 'unbound', 'hnsw', 'hnsw', 250, " +
        "CAST(-1 AS BIGINT), TRUE, TRUE, FALSE), " +
        "('products_ivf', 'distributed', 'ivf', 'ivf', 500, " +
        "CAST(-1 AS BIGINT), FALSE, FALSE, TRUE), " +
        "('products_mem', 'collected', 'flat', 'exact-broadcast', 10000, " +
        "CAST(200 AS BIGINT), FALSE, FALSE, FALSE)" +
        ") AS t(name, posture, declared_index_type, serving_route, " +
        "num_candidates, collected_rows, lexical_index, " +
        "normalize_at_build, cdc_maintained) ORDER BY name"),

    "q_corpus_drop" ->
      ("SELECT * FROM (VALUES " +
        "('after_drop', FALSE, FALSE), ('after_search', TRUE, TRUE)" +
        ") AS t(phase, listed, stores_present) ORDER BY phase"),

    "q_statements" ->
      ("SELECT * FROM (VALUES " +
        "(CAST(1 AS BIGINT), 'CREATE TABLE', 'COMPLETED', " +
        "'CREATE TABLE `stm_in` (`v` BIGINT) WITH (''value.format'' = ''json-registry'');'), " +
        "(CAST(2 AS BIGINT), 'CREATE TABLE', 'COMPLETED', " +
        "'CREATE TABLE `stm_out` (`v` BIGINT) WITH (''value.format'' = ''json-registry'');'), " +
        "(CAST(3 AS BIGINT), 'SET', 'COMPLETED', " +
        "'SET ''execution.mode'' = ''continuous'';'), " +
        "(CAST(4 AS BIGINT), 'SET', 'COMPLETED', " +
        "'SET ''execution.trigger'' = ''available-now'';'), " +
        "(CAST(5 AS BIGINT), 'INSERT INTO', 'COMPLETED', " +
        "'insert into `stm_out` select `v` from `stm_in`;')" +
        ") AS t(statement_id, kind, phase, statement) ORDER BY statement_id"),

    "q_sql_filtered_mmr" ->
      ("SELECT doc_id AS qdoc, TRUE AS eq_ok, TRUE AS admitted_only_ok " +
        "FROM documents WHERE doc_id % 100 = 0 ORDER BY qdoc"),

    "q_sql_filtered_maxsim" ->
      ("SELECT doc_id AS qdoc, TRUE AS eq_ok, TRUE AS admitted_only_ok " +
        "FROM documents WHERE doc_id % 100 = 0 ORDER BY qdoc"),

    "q_sql_filtered_prf" ->
      ("SELECT doc_id AS qdoc, TRUE AS eq_ok, TRUE AS admitted_only_ok " +
        "FROM documents WHERE doc_id % 300 = 0 ORDER BY qdoc"),

    "q_sql_radius_filtered" ->
      ("SELECT q.vec_id AS query_id, c.vec_id AS match_id " +
        "FROM embeddings q, embeddings c WHERE q.vec_id % 20 = 0 " +
        "AND c.label % 4 = 1 " +
        "AND list_cosine_similarity(q.embedding, c.embedding) >= 0.3 " +
        "ORDER BY query_id, match_id"),

    "q_radius_facets" ->
      ("SELECT q.vec_id AS query_id, CAST(c.label AS BIGINT) AS facet, count(*) AS n " +
        "FROM embeddings q, embeddings c WHERE q.vec_id % 20 = 0 " +
        "AND list_cosine_similarity(q.embedding, c.embedding) >= 0.3 " +
        "GROUP BY 1, 2 ORDER BY query_id, facet"),

    "q_dedup_embedding" ->
      ("SELECT a.vec_id AS id1, b.vec_id AS id2, " +
        "CAST(round(list_cosine_similarity(a.embedding, b.embedding) * 1e6) AS BIGINT) AS cosine_1e6 " +
        "FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id " +
        "AND list_cosine_similarity(a.embedding, b.embedding) >= 0.35 " +
        "ORDER BY id1, id2"),

    // SemDeDup contract: DuckDB recomputes the exact 0.35 pair set with
    // its own cosine; the cluster-bounded pairs are a subset of it, so
    // the two implication booleans are guaranteed and pinned TRUE.
    "q_semdedup_contract" ->
      ("WITH pairs AS (SELECT a.vec_id AS id1, b.vec_id AS id2 " +
        "FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id " +
        "AND list_cosine_similarity(a.embedding, b.embedding) >= 0.35), " +
        "paired AS (SELECT id1 AS vec_id FROM pairs UNION SELECT id2 FROM pairs) " +
        "SELECT vec_id, vec_id NOT IN (SELECT vec_id FROM paired) AS is_isolated, " +
        "TRUE AS isolated_kept_ok, TRUE AS removed_has_neighbor_ok " +
        "FROM embeddings ORDER BY vec_id"),

    // D4 prototype pruning: the oracle replays the whole anchor-celled
    // recipe — argmax-cosine cells against the 8 lowest-id vectors
    // (ORDER BY cos DESC, aid = the Spark fold's max(struct(cos,-aid))),
    // per-cell mean centroid quantized to FLOAT[] (f32 quantization is
    // summation-order-invariant on this corpus — spec-asserted), then
    // rank by cosine-to-centroid DESC with id tie-break and keep
    // rank > ceil(0.25 * n_cell).
    "q_proto_prune" ->
      ("WITH anchors AS (SELECT vec_id AS aid, embedding AS av " +
        "FROM embeddings ORDER BY vec_id LIMIT 8), " +
        "scored AS (SELECT e.vec_id, e.embedding, a.aid, " +
        "list_cosine_similarity(e.embedding, a.av) AS cos " +
        "FROM embeddings e CROSS JOIN anchors a), " +
        "cells AS (SELECT vec_id, embedding, aid AS cell FROM (" +
        "SELECT *, row_number() OVER (PARTITION BY vec_id " +
        "ORDER BY cos DESC, aid) AS rn FROM scored) WHERE rn = 1), " +
        "cent AS (SELECT cell, i, avg(CAST(embedding[i] AS DOUBLE)) AS m " +
        "FROM cells CROSS JOIN UNNEST(range(1, 65)) r(i) GROUP BY cell, i), " +
        "cv AS (SELECT cell, CAST(list(m ORDER BY i) AS FLOAT[]) AS cvec " +
        "FROM cent GROUP BY cell), " +
        "pr AS (SELECT c.vec_id, c.cell, " +
        "list_cosine_similarity(c.embedding, v.cvec) AS proto " +
        "FROM cells c JOIN cv v USING (cell)), " +
        "rk AS (SELECT vec_id, cell, " +
        "row_number() OVER (PARTITION BY cell ORDER BY proto DESC, vec_id) AS proto_rank, " +
        "count(*) OVER (PARTITION BY cell) AS n_cell FROM pr) " +
        "SELECT vec_id, cell, n_cell, CAST(proto_rank AS BIGINT) AS proto_rank " +
        "FROM rk WHERE proto_rank > ceil(0.25 * n_cell) ORDER BY vec_id"),

    // token chunker: same nChunks formula (1 if the doc fits, else
    // ceil((n - size) / stride) + 1), 1-based inclusive list slicing.
    "q_chunk_tokens" ->
      ("WITH toks AS (SELECT doc_id, " +
        "list_filter(regexp_split_to_array(text, '\\s+'), t -> len(t) > 0) AS tk " +
        "FROM documents), " +
        "b AS (SELECT doc_id, tk, len(tk) AS n, " +
        "CASE WHEN len(tk) <= 32 THEN 1 " +
        "ELSE CAST(ceil((len(tk) - 32) / 24.0) AS INT) + 1 END AS nc " +
        "FROM toks WHERE len(tk) > 0) " +
        "SELECT doc_id, i AS chunk_id, " +
        "CAST(least(32, n - i * 24) AS BIGINT) AS n_chunk_tok, " +
        "array_to_string(tk[CAST(i*24+1 AS INT):CAST(i*24+32 AS INT)], ' ') AS chunk_text " +
        "FROM b CROSS JOIN UNNEST(range(0, nc)) r(i) " +
        "ORDER BY doc_id, chunk_id"),

    "q_semantic_decontam" ->
      ("SELECT t.vec_id, CAST(t.label AS BIGINT) AS label " +
        "FROM embeddings t WHERE t.vec_id % 5 <> 0 " +
        "AND NOT EXISTS (SELECT 1 FROM embeddings b WHERE b.vec_id % 5 = 0 " +
        "AND list_cosine_similarity(t.embedding, b.embedding) >= 0.35) " +
        "ORDER BY vec_id"),

    // duplicated 8-token spans: the oracle rebuilds every sliding window
    // from gram TEXT (1-based DuckDB list slicing = the operator's `pos`
    // spelling) and keeps windows seen in >= 2 distinct docs.
    "q_dup_spans" ->
      ("WITH toks AS (SELECT doc_id, " +
        "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0) AS tk " +
        "FROM documents), " +
        "grams AS (SELECT doc_id, i AS pos, array_to_string(tk[i:i+7], ' ') AS gram " +
        "FROM toks, UNNEST(range(1, len(tk) - 6)) AS r(i) WHERE len(tk) >= 8), " +
        "dup AS (SELECT gram, count(DISTINCT doc_id) AS n_docs FROM grams " +
        "GROUP BY gram HAVING count(DISTINCT doc_id) >= 2) " +
        "SELECT g.doc_id, g.pos, d.n_docs FROM grams g JOIN dup d ON g.gram = d.gram " +
        "ORDER BY doc_id, pos"),

    // span scrub: coverage = union of 8-token windows of every non-keeper
    // occurrence of a duplicated gram; text rebuilt from uncovered tokens.
    "q_span_scrub" ->
      ("WITH toks AS (SELECT doc_id, " +
        "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0) AS tk " +
        "FROM documents), " +
        "tokens AS (SELECT doc_id, i AS p, tk[i] AS tok " +
        "FROM toks, UNNEST(range(1, len(tk)+1)) r(i) WHERE len(tk) > 0), " +
        "grams AS (SELECT doc_id, i AS pos, array_to_string(tk[i:i+7], ' ') AS gram " +
        "FROM toks, UNNEST(range(1, len(tk) - 6)) AS r(i) WHERE len(tk) >= 8), " +
        "dup AS (SELECT gram, min(doc_id) AS keeper FROM grams " +
        "GROUP BY gram HAVING count(DISTINCT doc_id) >= 2), " +
        "cov AS (SELECT DISTINCT g.doc_id, g.pos + o AS p " +
        "FROM grams g JOIN dup d USING (gram), UNNEST(range(0, 8)) r2(o) " +
        "WHERE g.doc_id <> d.keeper), " +
        "m AS (SELECT t.doc_id, t.p, t.tok, c.p IS NOT NULL AS cvd " +
        "FROM tokens t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.p = c.p) " +
        "SELECT doc_id, count(*) AS n_tok, " +
        "CAST(sum(CASE WHEN cvd THEN 1 ELSE 0 END) AS BIGINT) AS n_removed, " +
        "coalesce(string_agg(tok, ' ' ORDER BY p) FILTER (WHERE NOT cvd), '') AS clean_text " +
        "FROM m GROUP BY doc_id ORDER BY doc_id"),

    "q_prompt_assembly" ->
      ("SELECT doc_id, json_object('role', 'user', 'content', text, 'lang', lang) AS prompt " +
        "FROM documents ORDER BY doc_id"),

    "q_text_stats" ->
      ("SELECT doc_id, " +
        "CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tok_ws, " +
        "len(regexp_extract_all(text, ' ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+')) AS n_tok_bpe, " +
        "length(text) - length(regexp_replace(text, '[!\"#$%&''()*+,\\-./:;<=>?@\\[\\\\\\]^_`{|}~]', '', 'g')) AS n_punct, " +
        "CASE WHEN len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0)) = 0 THEN 0.0 " +
        "ELSE CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        "t -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','as','with','was','at','by','be','this'], t))) AS DOUBLE) " +
        "/ CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0)) AS DOUBLE) END AS stopword_ratio " +
        "FROM documents ORDER BY doc_id"),

    "q_ngram_jaccard" ->
      ("WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0) AS tk FROM documents), " +
        "grams AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS gram " +
        "FROM toks, UNNEST(range(1, greatest(len(tk) - 1, 1))) AS r(i) WHERE len(tk) >= 3), " +
        "counts AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id), " +
        "common AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS common " +
        "FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id GROUP BY 1, 2) " +
        "SELECT id1, id2, jaccard FROM (" +
        "SELECT id1, id2, CAST(common AS DOUBLE) / CAST(c1.n_grams + c2.n_grams - common AS DOUBLE) AS jaccard " +
        "FROM common JOIN counts c1 ON c1.doc_id = id1 JOIN counts c2 ON c2.doc_id = id2) " +
        "WHERE jaccard >= 0.3 ORDER BY id1, id2"),

    "q3_shipping" ->
      ("SELECT l_orderkey, revenue, n_lines FROM (" +
        "SELECT l_orderkey, " +
        "sum(round(l_extendedprice*100) * (100 - round(l_discount*100)))/10000.0 AS revenue, " +
        "count(*) AS n_lines " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01' " +
        "AND l_shipdate > TIMESTAMP '1998-01-01' " +
        "GROUP BY l_orderkey) ORDER BY revenue DESC, l_orderkey LIMIT 10"),

    "q5_region_revenue" ->
      ("SELECT n_name, sum(round(l_extendedprice*100) * (100 - round(l_discount*100)))/10000.0 AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "WHERE r_name = 'ASIA' GROUP BY n_name ORDER BY revenue DESC, n_name"),

    "q_semi_join" ->
      ("SELECT o_orderstatus, count(*) AS n FROM orders o " +
        "WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R') " +
        "GROUP BY o_orderstatus ORDER BY o_orderstatus"),

    "q_anti_join" ->
      ("SELECT c_custkey, c_name FROM customer c " +
        "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
        "AND year(o.o_orderdate) = 1995) ORDER BY c_custkey"),

    "q_theta_join" ->
      ("SELECT p_brand, count(*) AS n FROM lineitem JOIN part " +
        "ON l_partkey = p_partkey AND l_extendedprice > p_retailprice * 20 " +
        "GROUP BY p_brand ORDER BY p_brand"),

    "q_window_rank" ->
      ("SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS INTEGER) AS rnk FROM (" +
        "SELECT o_custkey, o_orderkey, o_totalprice, " +
        "row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk " +
        "FROM orders) WHERE rnk <= 3 ORDER BY o_custkey, rnk"),

    "q_window_running" ->
      ("SELECT event_id, user_id, " +
        "sum(round(value*100)) OVER (PARTITION BY user_id ORDER BY event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS running_value " +
        "FROM events ORDER BY event_id"),

    "q_rollup" ->
      ("SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n " +
        "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) " +
        "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"),

    "q_distinct_agg" ->
      ("SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp, " +
        "count(DISTINCT l_partkey) AS n_part, count(*) AS n " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),

    "q_set_ops" ->
      ("(SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995 " +
        "INTERSECT SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996) " +
        "EXCEPT SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 2000 " +
        "ORDER BY o_custkey"),

    "q_sort_limit" ->
      ("SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem " +
        "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20"),

    "q_set_ops_all" ->
      ("SELECT o_custkey, count(*) AS n FROM (" +
        "(SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995 " +
        "INTERSECT ALL SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996) " +
        "EXCEPT ALL SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2000) " +
        "GROUP BY o_custkey ORDER BY o_custkey"),

    "q_pivot" ->
      ("SELECT user_id, " +
        "CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click, " +
        "CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error, " +
        "CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase, " +
        "CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup, " +
        "CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view " +
        "FROM events GROUP BY user_id ORDER BY user_id"),

    // outer coalesce: DuckDB's array_to_string maps an EMPTY list to NULL,
    // Spark's concat_ws maps it to ''
    "q_conversation" ->
      ("SELECT event_id, user_id, " +
        "coalesce(array_to_string(list(event_type) OVER (PARTITION BY user_id ORDER BY event_id " +
        "ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), '|'), '') AS history " +
        "FROM events ORDER BY event_id"),

    "q_events_tumbling" ->
      ("SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour, event_type, " +
        "count(*) AS n, sum(round(value*100))/100.0 AS sum_value " +
        "FROM events GROUP BY 1, 2 ORDER BY hour, event_type"),

    "q_sessionize" ->
      ("WITH gaps AS (SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts FROM events), " +
        "marks AS (SELECT user_id, CASE WHEN pts IS NULL OR ts - pts >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk FROM gaps) " +
        "SELECT user_id, CAST(sum(brk) AS BIGINT) AS n_sessions, count(*) AS n_events " +
        "FROM marks GROUP BY user_id ORDER BY user_id"),

    "q_multimodal_bytes" ->
      ("SELECT doc_id, octet_length(encode(text)) AS n_bytes, md5(text) AS digest " +
        "FROM documents ORDER BY doc_id"),

    "q_string_funcs" ->
      ("SELECT c_custkey, upper(c_name) AS up, substring(c_name, 1, 8) AS prefix, " +
        "c_mktsegment || '#' || c_name AS joined, length(c_name) AS len, " +
        "lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded, " +
        "levenshtein(c_mktsegment, 'BUILDING') AS dist " +
        "FROM customer ORDER BY c_custkey"),

    "q_date_math_funcs" ->
      ("SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m, " +
        "dayofmonth(o_orderdate) AS d, " +
        "CAST(round(sqrt(o_totalprice) * 1000000) AS BIGINT) AS sqrt_price_1e6, " +
        "CAST(round(ln(o_totalprice + 1) * 100) AS BIGINT) AS log_price_1e2, " +
        // CAST: DuckDB floor() returns DOUBLE but Spark floor() is LONG —
        // value-equal yet dtype-different columns hash-differ in the
        // driver's pandas gate (the r2 red row)
        "o_orderkey % 7 AS mod7, CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_k " +
        "FROM orders ORDER BY o_orderkey"),

    "q_percentile" ->
      ("SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS p50, " +
        "quantile_cont(l_quantity, 0.9) AS p90, " +
        "min(l_quantity) AS mn, max(l_quantity) AS mx " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),

    "q_sql_topk" ->
      ("SELECT query_id, match_id, CAST(rnk AS INTEGER) AS rank FROM (" +
        "SELECT q.vec_id AS query_id, c.vec_id AS match_id, " +
        "row_number() OVER (PARTITION BY q.vec_id " +
        "ORDER BY list_dot_product(q.embedding, c.embedding) DESC, c.vec_id) AS rnk " +
        "FROM embeddings q, embeddings c) WHERE rnk <= 3 " +
        "ORDER BY query_id, rank"),

    "q_asof_join" ->
      ("WITH purchases AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'), " +
        "signups AS (SELECT user_id, ts, value FROM events WHERE event_type = 'signup') " +
        "SELECT event_id, purchases.user_id AS user_id, value AS signup_value " +
        "FROM purchases ASOF LEFT JOIN signups " +
        "ON purchases.user_id = signups.user_id AND purchases.ts >= signups.ts " +
        "ORDER BY event_id"),

    "q_asof_forward" ->
      ("WITH purchases AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'), " +
        "signups AS (SELECT user_id, ts, value FROM events WHERE event_type = 'signup') " +
        "SELECT event_id, purchases.user_id AS user_id, value AS next_signup_value " +
        "FROM purchases ASOF LEFT JOIN signups " +
        "ON purchases.user_id = signups.user_id AND purchases.ts <= signups.ts " +
        "ORDER BY event_id"),

    "q_asof_sql" ->
      ("WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'), " +
        "s2 AS (SELECT user_id, ts, value FROM events WHERE event_type = 'signup') " +
        "SELECT event_id, p.user_id AS user_id, value AS signup_value " +
        "FROM p ASOF LEFT JOIN s2 " +
        "ON p.user_id = s2.user_id AND p.ts >= s2.ts " +
        "ORDER BY event_id"),

    "q_asof_sql_strict" ->
      ("WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'), " +
        "s2 AS (SELECT user_id, ts, value FROM events WHERE event_type = 'signup') " +
        "SELECT event_id, p.user_id AS user_id, value AS signup_value " +
        "FROM p ASOF LEFT JOIN s2 " +
        "ON p.user_id = s2.user_id AND p.ts > s2.ts " +
        "ORDER BY event_id"),

    "q_interval_sql" ->
      ("SELECT a.event_id AS event_id, b.event_id AS event_id2, a.user_id AS user_id " +
        "FROM events a JOIN events b ON a.user_id = b.user_id " +
        "AND a.event_id < b.event_id " +
        "AND abs(epoch_us(CAST(a.ts AS TIMESTAMP)) - epoch_us(CAST(b.ts AS TIMESTAMP))) <= 60000000 " +
        "ORDER BY event_id, event_id2"),

    "q_interval_join" ->
      ("SELECT a.event_id AS event_id, b.event_id AS event_id2, a.user_id AS user_id " +
        "FROM events a JOIN events b ON a.user_id = b.user_id " +
        "AND a.event_id < b.event_id " +
        "AND abs(epoch_us(CAST(a.ts AS TIMESTAMP)) - epoch_us(CAST(b.ts AS TIMESTAMP))) <= 60000000 " +
        "ORDER BY event_id, event_id2"),

    "q_window_lag" ->
      ("SELECT event_id, user_id, " +
        "lag(event_type, 1) OVER w AS prev_type, " +
        "lead(event_type, 1) OVER w AS next_type, " +
        "CAST(ntile(4) OVER w AS INTEGER) AS quartile " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id) " +
        "ORDER BY event_id"),

    "q_quality" ->
      ("SELECT doc_id, round((" +
        "least(CAST(length(text) AS DOUBLE) / 200.0, 1.0) + " +
        "CASE WHEN (CASE WHEN n_tok = 0 THEN 0.0 ELSE CAST(length(text) AS DOUBLE) / n_tok END) " +
        "BETWEEN 3 AND 12 THEN 1.0 ELSE 0.5 END + " +
        "(1.0 - least((CASE WHEN length(text) = 0 THEN 0.0 ELSE " +
        "CAST(length(text) - length(regexp_replace(text, '[!\"#$%&''()*+,\\-./:;<=>?@\\[\\\\\\]^_`{|}~]', '', 'g')) AS DOUBLE) " +
        "/ length(text) END) * 4.0, 1.0))" +
        ") / 3.0, 4) AS quality FROM (" +
        "SELECT doc_id, text, CAST(CASE WHEN len(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS DOUBLE) AS n_tok " +
        "FROM documents) ORDER BY doc_id"),

    "q_gopher_rules" ->
      ("WITH base AS (SELECT doc_id, text, " +
        "list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> len(t) > 0) AS toks, " +
        "list_filter(regexp_split_to_array(text, '\\n'), l -> len(trim(l)) > 0) AS lines " +
        "FROM documents), " +
        "m AS (SELECT doc_id, len(toks) AS n_words, " +
        "CASE WHEN len(toks) = 0 THEN 0.0 ELSE round(CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE) / len(toks), 4) END AS mean_word_len, " +
        "CASE WHEN len(toks) = 0 THEN 0.0 ELSE round(CAST((length(text) - length(replace(text, '#', ''))) + " +
        "(length(text) - length(replace(text, '...', ''))) / 3 AS DOUBLE) / len(toks), 4) END AS symbol_ratio, " +
        "CASE WHEN len(lines) = 0 THEN 0.0 ELSE round(CAST(len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]'))) AS DOUBLE) / len(lines), 4) END AS bullet_line_ratio, " +
        "CASE WHEN len(lines) = 0 THEN 0.0 ELSE round(CAST(len(list_filter(lines, l -> regexp_matches(trim(l), '\\.\\.\\.$'))) AS DOUBLE) / len(lines), 4) END AS ellipsis_line_ratio, " +
        "CASE WHEN len(toks) = 0 THEN 0.0 ELSE round(CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE) / len(toks), 4) END AS alpha_word_ratio, " +
        "len(list_distinct(list_filter(list_transform(toks, t -> lower(t)), " +
        "t -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','as','with','was','at','by','be','this'], t)))) AS n_stop_hits " +
        "FROM base) " +
        "SELECT *, (n_words BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3 AND 10) " +
        "AND symbol_ratio < 0.1 AND bullet_line_ratio < 0.9 AND ellipsis_line_ratio < 0.3 " +
        "AND alpha_word_ratio > 0.8 AND n_stop_hits >= 2 AS gopher_pass " +
        "FROM m ORDER BY doc_id"),

    "q_sql_topk_agg" ->
      ("SELECT query_id, match_id, CAST(rnk AS INTEGER) AS rank FROM (" +
        "SELECT q.vec_id AS query_id, c.vec_id AS match_id, " +
        "row_number() OVER (PARTITION BY q.vec_id " +
        "ORDER BY list_dot_product(q.embedding, c.embedding) DESC, c.vec_id) AS rnk " +
        "FROM embeddings q, embeddings c) WHERE rnk <= 3 " +
        "ORDER BY query_id, rank"),

    "q_hll_distinct" ->
      ("SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts, " +
        "TRUE AS hll_ok FROM lineitem GROUP BY 1 ORDER BY 1"),

    "q_sample_stratified" ->
      ("SELECT doc_id, source FROM documents " +
        "WHERE (((doc_id % 2147483648 + 2147483648) % 2147483648) * 2654435761) % 4294967296 < " +
        "CASE WHEN source = 'src0' THEN 4294967296 " +
        "WHEN source = 'src1' THEN 2147483648 " +
        "WHEN source = 'src2' THEN 1073741824 " +
        "ELSE 536870912 END ORDER BY doc_id"),

    // temperature sampling: per-lang thresholds recomputed from the data
    // (integer sqrt weights; ((T*w)/Σw)/n in the operator's exact IEEE
    // evaluation order; floor to the same 2^32-range integer threshold).
    "q_temperature_sample" ->
      ("WITH cnt AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang), " +
        "w AS (SELECT lang, n, CAST(round(sqrt(n)) AS BIGINT) AS w FROM cnt), " +
        "sw AS (SELECT CAST(sum(w) AS DOUBLE) AS sw FROM w), " +
        "th AS (SELECT lang, CAST(floor(least(1.0, 250.0 * w / sw / n) * 4294967296) AS BIGINT) AS th " +
        "FROM w CROSS JOIN sw) " +
        "SELECT d.doc_id, d.lang FROM documents d JOIN th USING (lang) " +
        "WHERE (((d.doc_id % 2147483648 + 2147483648) % 2147483648) * 2654435761) % 4294967296 < th " +
        "ORDER BY doc_id"),

    "q_pii_redact" ->
      ("SELECT doc_id, " +
        "regexp_replace(regexp_replace(regexp_replace(dirty, " +
        "'https?://[^\\s]+', '<URL>', 'g'), " +
        "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), " +
        "'\\b[0-9]{3}-[0-9]{4}\\b', '<PHONE>', 'g') AS clean, " +
        "CAST(len(regexp_extract_all(dirty, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_email, " +
        "CAST(len(regexp_extract_all(dirty, '\\b[0-9]{3}-[0-9]{4}\\b')) AS BIGINT) AS n_phone, " +
        "CAST(len(regexp_extract_all(dirty, 'https?://[^\\s]+')) AS BIGINT) AS n_url " +
        // pmod parity: Spark pmod is non-negative while DuckDB % is
        // sign-preserving — wrap so both agree for ANY id sign
        "FROM (SELECT doc_id, concat(text, ' contact user', doc_id, '@mail', " +
        "((doc_id % 7) + 7) % 7, '.com or 555-', " +
        "lpad(CAST(((doc_id % 10000) + 10000) % 10000 AS VARCHAR), 4, '0'), " +
        "' see https://ex', ((doc_id % 5) + 5) % 5, '.org/d/', doc_id) AS dirty FROM documents) " +
        "ORDER BY doc_id"),

    "q_decontaminate" ->
      ("WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0) AS tk FROM documents), " +
        "grams AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+3], ' ') AS gram " +
        "FROM toks, UNNEST(range(1, greatest(len(tk) - 2, 1))) AS r(i) WHERE len(tk) >= 4), " +
        "bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0) " +
        "SELECT g.doc_id, count(*) AS n_shared FROM grams g JOIN bench b ON g.gram = b.gram " +
        "WHERE g.doc_id % 97 <> 0 GROUP BY 1 HAVING count(*) >= 1 ORDER BY doc_id"),

    // the Bloom-served flags equal the exact-join flags (one-sided error;
    // FP probability ~1e-6 at the designed filter size — see the query's
    // comment), so the oracle is the exact contamination SQL verbatim
    // with the operator's own output column name
    "q_bloom_decontam" ->
      ("WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0) AS tk FROM documents), " +
        "grams AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+3], ' ') AS gram " +
        "FROM toks, UNNEST(range(1, greatest(len(tk) - 2, 1))) AS r(i) WHERE len(tk) >= 4), " +
        "bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0) " +
        "SELECT g.doc_id, count(*) AS n_flagged FROM grams g JOIN bench b ON g.gram = b.gram " +
        "WHERE g.doc_id % 97 <> 0 GROUP BY 1 HAVING count(*) >= 1 ORDER BY doc_id"),

    "q_repetition" ->
      ("WITH toks AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0)) AS tok FROM documents), " +
        "cnts AS (SELECT doc_id, tok, count(*) AS cnt FROM toks GROUP BY 1, 2) " +
        "SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tok, count(*) AS n_distinct, " +
        "CAST(max(cnt) AS BIGINT) AS top_cnt FROM cnts GROUP BY doc_id ORDER BY doc_id"),

    // the composed curation recipe: each stage lifts its own proven
    // oracle spelling — gate (gopher exprs), dedup (normText window),
    // split (multiplicative-hash bands), decontamination (4-gram
    // anti-join), budget + packing (hash-order running sums).
    "q_curation_pipeline" ->
      ("WITH q AS (SELECT doc_id, source, lang, text FROM (" +
        "SELECT doc_id, source, lang, text, " +
        "list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> len(t) > 0) AS toks FROM documents) " +
        "WHERE len(toks) >= 20 " +
        "AND round(CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE) / len(toks), 4) BETWEEN 3 AND 10 " +
        "AND len(list_distinct(list_filter(list_transform(toks, t -> lower(t)), " +
        "t -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','as','with','was','at','by','be','this'], t)))) >= 2), " +
        // word-repetition gate: dup-2gram fraction <= 0.08, integer form
        "qtoks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0) AS tk FROM q), " +
        "c2 AS (SELECT doc_id, array_to_string(tk[i:i+1], ' ') AS gram, count(*) AS c " +
        "FROM qtoks, UNNEST(range(1, len(tk))) r(i) WHERE len(tk) >= 2 GROUP BY doc_id, gram), " +
        "rep AS (SELECT doc_id FROM (SELECT doc_id, sum(c) AS total, count(*) AS n_distinct " +
        "FROM c2 GROUP BY doc_id) WHERE (total - n_distinct) * 25 <= total * 2), " +
        // CCNet xent band over the rep-gated corpus's own unigram LM
        "dtx AS (SELECT doc_id, tok, count(*) AS cnt FROM (" +
        "SELECT doc_id, unnest(tk) AS tok FROM qtoks WHERE doc_id IN (SELECT doc_id FROM rep)) " +
        "GROUP BY doc_id, tok), " +
        "vocabx AS (SELECT tok, sum(cnt) AS c FROM dtx GROUP BY tok), " +
        "totx AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM vocabx), " +
        "keptx AS (SELECT doc_id FROM (SELECT doc_id, " +
        "round(-sum(cnt * (ln(c) - ln(n))) / sum(cnt), 4) AS xent " +
        "FROM dtx JOIN vocabx USING (tok) CROSS JOIN totx GROUP BY doc_id) WHERE xent <= 3.45), " +
        // DSIR: add-1-smoothed en-vs-raw log-ratio over the xent-kept set
        "dt3 AS (SELECT * FROM dtx WHERE doc_id IN (SELECT doc_id FROM keptx)), " +
        "rawv AS (SELECT tok, sum(cnt) AS cr FROM dt3 GROUP BY tok), " +
        "tgtv AS (SELECT tok, sum(cnt) AS ct FROM dt3 " +
        "WHERE doc_id IN (SELECT doc_id FROM q WHERE lang = 'en') GROUP BY tok), " +
        "vocab2 AS (SELECT r.tok AS tok, cr, coalesce(ct, 0) AS ct " +
        "FROM rawv r LEFT JOIN tgtv tt ON r.tok = tt.tok), " +
        "tot2 AS (SELECT CAST(sum(cr) AS DOUBLE) AS nr, CAST(sum(ct) AS DOUBLE) AS nt, " +
        "CAST(count(*) AS DOUBLE) AS v FROM vocab2), " +
        "ratio AS (SELECT tok, ln(ct + 1) - ln(nt + v) - ln(cr + 1) + ln(nr + v) AS logratio " +
        "FROM vocab2 CROSS JOIN tot2), " +
        "sel AS (SELECT doc_id FROM (SELECT doc_id, round(sum(cnt * logratio), 4) AS dw " +
        "FROM dt3 JOIN ratio USING (tok) GROUP BY doc_id) WHERE dw >= 0), " +
        "d2 AS (SELECT doc_id, source, text FROM q " +
        "WHERE doc_id IN (SELECT doc_id FROM sel) " +
        "QUALIFY doc_id = min(doc_id) OVER (PARTITION BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))), " +
        "sp AS (SELECT doc_id, source, text, CASE WHEN " +
        "(((doc_id % 2147483648 + 2147483648) % 2147483648) * 2654435761) % 4294967296 < 3865470566 " +
        "THEN 'train' ELSE 'test' END AS split FROM d2), " +
        "grams AS (SELECT DISTINCT doc_id, split, array_to_string(tk[i:i+3], ' ') AS gram " +
        "FROM (SELECT doc_id, split, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0) AS tk FROM sp), " +
        "UNNEST(range(1, greatest(len(tk) - 2, 1))) AS r(i) WHERE len(tk) >= 4), " +
        "cont AS (SELECT DISTINCT g.doc_id FROM grams g " +
        "JOIN (SELECT DISTINCT gram FROM grams WHERE split = 'test') b ON g.gram = b.gram " +
        "WHERE g.split = 'train'), " +
        "clean AS (SELECT doc_id, source, CAST(CASE WHEN len(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_tok " +
        "FROM sp WHERE split = 'train' AND doc_id NOT IN (SELECT doc_id FROM cont)), " +
        "budg AS (SELECT doc_id, source, n_tok FROM (" +
        "SELECT doc_id, source, n_tok, sum(n_tok) OVER (PARTITION BY source " +
        "ORDER BY (((doc_id % 2147483648 + 2147483648) % 2147483648) * 2654435761) % 4294967296, doc_id " +
        "ROWS UNBOUNDED PRECEDING) AS running FROM clean) WHERE running <= 3000), " +
        "r AS (SELECT doc_id, source, n_tok, COALESCE(sum(n_tok) OVER (PARTITION BY source " +
        "ORDER BY (((doc_id % 2147483648 + 2147483648) % 2147483648) * 2654435761) % 4294967296, doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before FROM budg) " +
        "SELECT doc_id, source, n_tok, CAST(cum_before // 256 AS BIGINT) AS pack_id, " +
        "CAST(cum_before % 256 AS BIGINT) AS pack_offset, " +
        "(cum_before % 256) + n_tok > 256 AS crosses FROM r ORDER BY doc_id"),

    "q_boilerplate_grams" ->
      ("WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0) AS tk FROM documents), " +
        "grams AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS gram " +
        "FROM toks, UNNEST(range(1, greatest(len(tk) - 1, 1))) AS r(i) WHERE len(tk) >= 3) " +
        "SELECT gram, count(*) AS doc_freq FROM grams GROUP BY gram " +
        "ORDER BY doc_freq DESC, gram LIMIT 20"),

    "q_ngram_repetition" ->
      ("WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0) AS tk FROM documents), " +
        "g AS (SELECT doc_id, CAST(n AS INTEGER) AS n, array_to_string(tk[i:i+n-1], ' ') AS gram " +
        "FROM toks, UNNEST([2, 3]) tn(n), UNNEST(range(1, len(tk) - n + 2)) r(i) WHERE len(tk) >= n), " +
        "c AS (SELECT doc_id, n, gram, count(*) AS c FROM g GROUP BY doc_id, n, gram) " +
        "SELECT doc_id, n, CAST(sum(c) AS BIGINT) AS total, count(*) AS n_distinct, " +
        "CAST(max(c) AS BIGINT) AS top_cnt FROM c GROUP BY doc_id, n ORDER BY doc_id, n"),

    // line dedup: the oracle replays the 6-token-line construction and
    // the keep rule (blank, under-threshold, or min-id keeper) with
    // DISTINCT window aggregates, rebuilding text via ordered string_agg.
    "q_line_dedup" ->
      ("WITH lined AS (SELECT doc_id, array_to_string(" +
        "[array_to_string(tk[i*6+1:i*6+6], ' ') " +
        "FOR i IN range(0, greatest(CAST(ceil(len(tk)/6.0) AS INT), 1))], chr(10)) AS text_lined " +
        "FROM (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0) AS tk FROM documents)), " +
        "lines AS (SELECT doc_id, i AS pos, sp[i] AS line, lower(trim(sp[i])) AS key " +
        "FROM (SELECT doc_id, string_split(text_lined, chr(10)) AS sp FROM lined), " +
        "UNNEST(range(1, len(sp)+1)) r(i)), " +
        "st AS (SELECT doc_id, pos, line, key, " +
        "count(DISTINCT doc_id) OVER (PARTITION BY key) AS nd, " +
        "min(doc_id) OVER (PARTITION BY key) AS keeper, " +
        "count(*) OVER (PARTITION BY doc_id) AS n_lines FROM lines) " +
        "SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines, count(*) AS n_kept, " +
        "string_agg(line, chr(10) ORDER BY pos) AS clean_text " +
        "FROM st WHERE len(key) = 0 OR nd < 2 OR doc_id = keeper " +
        "GROUP BY doc_id, n_lines ORDER BY doc_id"),

    // stop-line filter: mine keys in >= 3 docs, remove them from every
    // doc (no keeper), rebuild via ordered string_agg — same lined CTE.
    "q_stopline_filter" ->
      ("WITH lined AS (SELECT doc_id, array_to_string(" +
        "[array_to_string(tk[i*6+1:i*6+6], ' ') " +
        "FOR i IN range(0, greatest(CAST(ceil(len(tk)/6.0) AS INT), 1))], chr(10)) AS text_lined " +
        "FROM (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0) AS tk FROM documents)), " +
        "lines AS (SELECT doc_id, i AS pos, sp[i] AS line, lower(trim(sp[i])) AS key " +
        "FROM (SELECT doc_id, string_split(text_lined, chr(10)) AS sp FROM lined), " +
        "UNNEST(range(1, len(sp)+1)) r(i)), " +
        "stops AS (SELECT key FROM lines WHERE len(key) > 0 " +
        "GROUP BY key HAVING count(DISTINCT doc_id) >= 3), " +
        "st AS (SELECT doc_id, pos, line, key, " +
        "count(*) OVER (PARTITION BY doc_id) AS n_lines FROM lines) " +
        "SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines, count(*) AS n_kept, " +
        "string_agg(line, chr(10) ORDER BY pos) AS clean_text " +
        "FROM st WHERE key NOT IN (SELECT key FROM stops) " +
        "GROUP BY doc_id, n_lines ORDER BY doc_id"),

    // the sketch-first mine must be EXACT (candidates superset + exact
    // verify), so its consumer is oracled by the stop-line SQL verbatim
    "q_stopline_sketch" ->
      ("WITH lined AS (SELECT doc_id, array_to_string(" +
        "[array_to_string(tk[i*6+1:i*6+6], ' ') " +
        "FOR i IN range(0, greatest(CAST(ceil(len(tk)/6.0) AS INT), 1))], chr(10)) AS text_lined " +
        "FROM (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0) AS tk FROM documents)), " +
        "lines AS (SELECT doc_id, i AS pos, sp[i] AS line, lower(trim(sp[i])) AS key " +
        "FROM (SELECT doc_id, string_split(text_lined, chr(10)) AS sp FROM lined), " +
        "UNNEST(range(1, len(sp)+1)) r(i)), " +
        "stops AS (SELECT key FROM lines WHERE len(key) > 0 " +
        "GROUP BY key HAVING count(DISTINCT doc_id) >= 3), " +
        "st AS (SELECT doc_id, pos, line, key, " +
        "count(*) OVER (PARTITION BY doc_id) AS n_lines FROM lines) " +
        "SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines, count(*) AS n_kept, " +
        "string_agg(line, chr(10) ORDER BY pos) AS clean_text " +
        "FROM st WHERE key NOT IN (SELECT key FROM stops) " +
        "GROUP BY doc_id, n_lines ORDER BY doc_id"),

    // unigram cross-entropy: the oracle mirrors the MLE formula term by
    // term (ln(c) - ln(n), then the negated length-normalized sum) so
    // both engines round the same double at 4 places.
    "q_unigram_xent" ->
      ("WITH dt AS (SELECT doc_id, tok, count(*) AS cnt FROM (" +
        "SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0)) AS tok " +
        "FROM documents) GROUP BY doc_id, tok), " +
        "vocab AS (SELECT tok, sum(cnt) AS c FROM dt GROUP BY tok), " +
        "tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM vocab) " +
        "SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tok, " +
        "round(-sum(cnt * (ln(c) - ln(n))) / sum(cnt), 4) AS xent " +
        "FROM dt JOIN vocab USING (tok) CROSS JOIN tot " +
        "GROUP BY doc_id ORDER BY doc_id"),

    // CCNet buckets: the oracle replays the xent, the 20% hash sample
    // (the Knuth multiplicative hash spelling), the two rank cutoffs
    // (ceil(m/3), ceil(2m/3) over (xent, id) order), and the band
    // comparison with the same lexicographic tie-break.
    "q_xent_buckets" ->
      ("WITH dt AS (SELECT doc_id, tok, count(*) AS cnt FROM (" +
        "SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0)) AS tok " +
        "FROM documents) GROUP BY doc_id, tok), " +
        "vocab AS (SELECT tok, sum(cnt) AS c FROM dt GROUP BY tok), " +
        "tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM vocab), " +
        "x AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tok, " +
        "round(-sum(cnt * (ln(c) - ln(n))) / sum(cnt), 4) AS xent " +
        "FROM dt JOIN vocab USING (tok) CROSS JOIN tot GROUP BY doc_id), " +
        "s AS (SELECT xent, doc_id AS id, " +
        "row_number() OVER (ORDER BY xent, doc_id) AS rn, count(*) OVER () AS m " +
        "FROM x WHERE (((doc_id % 2147483648 + 2147483648) % 2147483648) * 2654435761) % 4294967296 < 858993459), " +
        "cut AS (SELECT xent, id FROM s WHERE rn = CAST(ceil(m / 3.0) AS BIGINT) " +
        "OR rn = CAST(ceil(2.0 * m / 3.0) AS BIGINT)) " +
        "SELECT x.doc_id, x.n_tok, x.xent, " +
        "CAST(sum(CASE WHEN x.xent > c.xent OR (x.xent = c.xent AND x.doc_id > c.id) " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS bucket " +
        "FROM x CROSS JOIN cut c GROUP BY x.doc_id, x.n_tok, x.xent " +
        "ORDER BY doc_id"),

    // bigram cross-entropy: the oracle mirrors the add-1 conditional
    // term by term (ln(c12+1) - ln(c1+v), negated length-normalized sum)
    // so both engines round the same double at 4 places; bigrams come
    // from 1-based list indexing over the shared tokenizer.
    "q_bigram_xent" ->
      ("WITH base AS (SELECT doc_id, " +
        "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0) AS tk " +
        "FROM documents), " +
        "bg AS (SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2, count(*) AS cnt " +
        "FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i FROM base WHERE len(tk) >= 2) " +
        "GROUP BY doc_id, w1, w2), " +
        "c12 AS (SELECT w1, w2, sum(cnt) AS c12 FROM bg GROUP BY w1, w2), " +
        "c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY w1), " +
        "vc AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v FROM " +
        "(SELECT unnest(tk) AS tok FROM base)) " +
        "SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigram, " +
        "round(-sum(cnt * (ln(c12 + 1) - ln(c1 + v))) / sum(cnt), 4) AS xent2 " +
        "FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vc " +
        "GROUP BY doc_id ORDER BY doc_id"),

    // cross-corpus divergence: union-vocab add-1 LMs, KL both ways; the
    // smoothed probabilities are exact-integer ratios so only the ln
    // terms carry libm ulps (the measured-margin argument again).
    "q_corpus_divergence" ->
      ("WITH wa AS (SELECT tok, count(*) AS ca FROM (" +
        "SELECT unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0)) AS tok " +
        "FROM documents WHERE lang = 'en') GROUP BY tok), " +
        "wb AS (SELECT tok, count(*) AS cb FROM (" +
        "SELECT unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0)) AS tok " +
        "FROM documents WHERE lang <> 'en') GROUP BY tok), " +
        "u AS (SELECT tok, coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb " +
        "FROM wa FULL OUTER JOIN wb USING (tok)), " +
        "tot AS (SELECT CAST(sum(ca) AS DOUBLE) AS na, CAST(sum(cb) AS DOUBLE) AS nb, " +
        "CAST(count(*) AS DOUBLE) AS v FROM u) " +
        "SELECT CAST(sum(ca) AS BIGINT) AS n_tok_a, CAST(sum(cb) AS BIGINT) AS n_tok_b, " +
        "count(*) AS vocab, " +
        "round(sum(((ca+1)/(na+v)) * (ln((ca+1)/(na+v)) - ln((cb+1)/(nb+v)))), 4) AS kl_ab, " +
        "round(sum(((cb+1)/(nb+v)) * (ln((cb+1)/(nb+v)) - ln((ca+1)/(na+v)))), 4) AS kl_ba " +
        "FROM u CROSS JOIN tot"),

    // DSIR: add-1-smoothed target/raw unigram log-ratio, selection =
    // top-100 by (rounded weight desc, doc_id) — the window spelling of
    // the Spark side's TakeOrderedAndProject + broadcast semi-probe.
    "q_dsir_select" ->
      ("WITH dt AS (SELECT doc_id, tok, count(*) AS cnt FROM (" +
        "SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0)) AS tok " +
        "FROM documents) GROUP BY doc_id, tok), " +
        "raw AS (SELECT tok, sum(cnt) AS cr FROM dt GROUP BY tok), " +
        "tgt AS (SELECT tok, sum(cnt) AS ct FROM dt " +
        "WHERE doc_id IN (SELECT doc_id FROM documents WHERE lang = 'en') GROUP BY tok), " +
        "vocab AS (SELECT r.tok AS tok, cr, coalesce(ct, 0) AS ct " +
        "FROM raw r LEFT JOIN tgt tt ON r.tok = tt.tok), " +
        "tot AS (SELECT CAST(sum(cr) AS DOUBLE) AS nr, CAST(sum(ct) AS DOUBLE) AS nt, " +
        "CAST(count(*) AS DOUBLE) AS v FROM vocab), " +
        "ratio AS (SELECT tok, ln(ct + 1) - ln(nt + v) - ln(cr + 1) + ln(nr + v) AS logratio " +
        "FROM vocab CROSS JOIN tot), " +
        "w AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tok, " +
        "round(sum(cnt * logratio), 4) AS dsir_weight " +
        "FROM dt JOIN ratio USING (tok) GROUP BY doc_id) " +
        "SELECT doc_id, n_tok, dsir_weight, " +
        "row_number() OVER (ORDER BY dsir_weight DESC, doc_id) <= 100 AS selected " +
        "FROM w ORDER BY doc_id"),

    "q_events_sliding" ->
      ("SELECT win_start, event_type, count(*) AS n FROM (" +
        "SELECT CAST(floor(epoch(ts) / 900) AS BIGINT) * 900 - i * 900 AS win_start, " +
        "event_type FROM events, UNNEST([0, 1, 2, 3]) AS t(i)) " +
        "GROUP BY 1, 2 ORDER BY win_start, event_type"),

    "q_date_arith" ->
      ("SELECT o_orderkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start, " +
        "datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since, " +
        "CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m, " +
        "CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS eom " +
        "FROM orders ORDER BY o_orderkey"),

    "q_window_range" ->
      ("SELECT o_orderkey, y, cents, CAST(sum(cents) OVER (PARTITION BY y ORDER BY cents " +
        "RANGE BETWEEN 100000 PRECEDING AND CURRENT ROW) AS BIGINT) AS near_sum FROM (" +
        "SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS y, " +
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders) " +
        "ORDER BY o_orderkey"),

    "q_formats_roundtrip" ->
      ("SELECT format, count(*) AS n_rows, CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
        "count(DISTINCT source) AS n_sources FROM (" +
        "SELECT 'orc' AS format, n_chars, source FROM documents " +
        "UNION ALL SELECT 'csv', n_chars, source FROM documents) " +
        "GROUP BY format ORDER BY format"),

    "q_multimodal_resize" ->
      ("SELECT doc_id AS media_id, CASE WHEN doc_id % 3 = 0 THEN 'image' " +
        "WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind, " +
        "CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height, " +
        "CAST(256 AS INTEGER) AS n_out FROM documents ORDER BY media_id"),

    "q_frame_sample" ->
      ("WITH m AS (SELECT doc_id AS media_id, octet_length(encode(text)) AS n " +
        "FROM documents) " +
        "SELECT media_id, CAST(i AS INTEGER) AS frame_idx, " +
        "CAST(least(256, n - i * 256) AS INTEGER) AS frame_len " +
        "FROM m, UNNEST(range(0, (n + 255) // 256, 4)) AS t(i) " +
        "ORDER BY media_id, frame_idx"),

    "q_embed_contract" ->
      ("SELECT doc_id, TRUE AS unit_norm_ok FROM documents ORDER BY doc_id"),

    "q_rag_contract" ->
      ("SELECT doc_id, TRUE AS prompt_role_ok, TRUE AS response_role_ok, " +
        "TRUE AS has_products, TRUE AS prompt_has_content " +
        "FROM documents ORDER BY doc_id"),

    "q_multimodal_contract" ->
      ("SELECT doc_id AS media_id, CASE WHEN doc_id % 3 = 0 THEN 'image' " +
        "WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind, " +
        "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, " +
        "TRUE AS width_ok, TRUE AS audio_1d_ok " +
        "FROM documents ORDER BY media_id"),

    "q_lang_id" ->
      ("WITH toks AS (SELECT doc_id, unnest(list_filter(" +
        "regexp_split_to_array(lower(text), '[^\\p{L}\\p{N}]+'), t -> len(t) > 0)) AS tok " +
        "FROM documents), " +
        "c AS (SELECT doc_id, " +
        "count(*) FILTER (WHERE tok IN ('the','and','of','to','is','you','that','with')) AS en, " +
        "count(*) FILTER (WHERE tok IN ('el','la','los','las','de','que','es','una','para','por')) AS es, " +
        "count(*) FILTER (WHERE tok IN ('le','les','des','une','est','dans','pour','avec','sur')) AS fr, " +
        "count(*) FILTER (WHERE tok IN ('der','die','das','und','ist','nicht','ein','mit','von')) AS de, " +
        "count(*) FILTER (WHERE tok IN ('il','di','che','per','con','sono','della','una')) AS it, " +
        "count(*) FILTER (WHERE tok IN ('os','uma','com','para','mais','como','dos','ser')) AS pt " +
        "FROM toks GROUP BY doc_id) " +
        "SELECT d.doc_id, CASE " +
        "WHEN c.doc_id IS NULL OR greatest(en, es, fr, de, it, pt) = 0 THEN 'und' " +
        "WHEN pt = greatest(en, es, fr, de, it, pt) THEN 'pt' " +
        "WHEN it = greatest(en, es, fr, de, it, pt) THEN 'it' " +
        "WHEN fr = greatest(en, es, fr, de, it, pt) THEN 'fr' " +
        "WHEN es = greatest(en, es, fr, de, it, pt) THEN 'es' " +
        "WHEN en = greatest(en, es, fr, de, it, pt) THEN 'en' " +
        "ELSE 'de' END AS lang " +
        "FROM documents d LEFT JOIN c ON d.doc_id = c.doc_id ORDER BY d.doc_id"),

    // split thresholds are the Scala-side (cumFraction * 2^32).toLong
    // literals: 0.8 -> 3435973836, 0.9 -> 3865470566 (double rounding
    // included, so both engines band identically)
    "q_split_assign" ->
      ("SELECT doc_id, source, CASE WHEN h < 3435973836 THEN 'train' " +
        "WHEN h < 3865470566 THEN 'val' ELSE 'test' END AS split FROM (" +
        "SELECT doc_id, source, " +
        "(((doc_id % 2147483648 + 2147483648) % 2147483648) * 2654435761) % 4294967296 AS h " +
        "FROM documents) ORDER BY doc_id"),

    "q_take_per_stratum" ->
      ("SELECT doc_id, source FROM (SELECT doc_id, source, row_number() OVER (" +
        "PARTITION BY source ORDER BY " +
        "(((doc_id % 2147483648 + 2147483648) % 2147483648) * 2654435761) % 4294967296, doc_id" +
        ") AS rn FROM documents) WHERE rn <= 10 ORDER BY doc_id"),

    "q_seq_packing" ->
      ("WITH d AS (SELECT doc_id, source, CAST(CASE WHEN len(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_tok FROM documents), " +
        "r AS (SELECT doc_id, source, n_tok, COALESCE(sum(n_tok) OVER (" +
        "PARTITION BY source ORDER BY (((doc_id % 2147483648 + 2147483648) % 2147483648) * 2654435761) % 4294967296, doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before FROM d) " +
        "SELECT doc_id, source, n_tok, CAST(cum_before // 512 AS BIGINT) AS pack_id, " +
        "CAST(cum_before % 512 AS BIGINT) AS pack_offset, " +
        "(cum_before % 512) + n_tok > 512 AS crosses " +
        "FROM r ORDER BY doc_id"),

    "q_token_budget" ->
      ("WITH d AS (SELECT doc_id, source, CAST(CASE WHEN len(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_tok FROM documents), " +
        "r AS (SELECT doc_id, source, n_tok, sum(n_tok) OVER (" +
        "PARTITION BY source ORDER BY (((doc_id % 2147483648 + 2147483648) % 2147483648) * 2654435761) % 4294967296, doc_id " +
        "ROWS UNBOUNDED PRECEDING) AS running_tok FROM d) " +
        "SELECT doc_id, source, n_tok, CAST(running_tok AS BIGINT) AS running_tok " +
        "FROM r WHERE running_tok <= 2000 ORDER BY doc_id"),

    "q_full_outer" ->
      ("WITH y95 AS (SELECT o_custkey AS k, count(*) AS n_1995 FROM orders " +
        "WHERE year(o_orderdate) = 1995 GROUP BY 1), " +
        "y96 AS (SELECT o_custkey AS k, count(*) AS n_1996 FROM orders " +
        "WHERE year(o_orderdate) = 1996 GROUP BY 1) " +
        "SELECT coalesce(y95.k, y96.k) AS custkey, n_1995, n_1996 " +
        "FROM y95 FULL OUTER JOIN y96 ON y95.k = y96.k ORDER BY custkey"),

    "q_array_funcs" ->
      ("SELECT doc_id, CAST(len(list_distinct(tk)) AS BIGINT) AS n_uniq, " +
        "array_to_string(list_sort(list_distinct(tk))[1:3], ' ') AS first3, " +
        "list_contains(tk, 'the') AS has_the " +
        "FROM (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        "t -> len(t) > 0) AS tk FROM documents) ORDER BY doc_id"),

    "q_approx_percentile" ->
      ("SELECT l_returnflag, TRUE AS p50_ok FROM lineitem " +
        "GROUP BY 1 ORDER BY 1"),

    "q_quality_classifier_contract" ->
      ("SELECT doc_id, TRUE AS score_in_unit, TRUE AS auc_ok " +
        "FROM documents ORDER BY doc_id"),
  )
}
