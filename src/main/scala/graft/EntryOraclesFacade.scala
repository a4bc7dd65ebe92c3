package graft

import scala.collection.immutable.ListMap

import graft.EntryShared._

/** DuckDB-equivalent SQL for the SQL-facade/streaming/model query board — one
  * segment of [[EntryOracles.oracleSql]], split mechanically along the
  * same EntryQueries* seams as the query board (order preserved by
  * ListMap concatenation; judge r16 task 6).
  */
private[graft] object EntryOraclesFacade {
  def oracleSql: ListMap[String, String] = ListMap(
    "q_sql_mmr_indexed" ->
      ("SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings " +
        "WHERE vec_id % 20 = 0 ORDER BY query_id"),

    "q_stream_search_indexed" ->
      ("SELECT vec_id AS query_id, TRUE AS eq_ok FROM embeddings " +
        "WHERE vec_id % 50 = 0 ORDER BY query_id"),

    // two lifecycle phases per query: the drained-CDC serve and the
    // post-COMPACT serve, both strict-equal to the exact twin
    "q_sql_cdc_maintain" ->
      ("SELECT p.phase, e.vec_id AS query_id, TRUE AS eq_ok, TRUE AS del_ok " +
        "FROM embeddings e, (VALUES ('compacted'), ('served')) AS p(phase) " +
        "WHERE e.vec_id % 100 = 0 ORDER BY p.phase, query_id"),

    "q_sql_cdc_maintain_hnsw" ->
      ("SELECT 'served' AS phase, vec_id AS query_id, TRUE AS eq_ok, " +
        "TRUE AS del_ok FROM embeddings WHERE vec_id % 100 = 0 " +
        "ORDER BY query_id"),

    "q_sql_cdc_maintain_lex" ->
      ("SELECT doc_id AS qdoc, TRUE AS eq_ok, TRUE AS del_ok " +
        "FROM documents WHERE doc_id % 250 = 0 ORDER BY qdoc"),

    "q_sql_maxsim_indexed" ->
      ("SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings " +
        "WHERE vec_id % 25 = 0 ORDER BY query_id"),

    "q_topic_roundtrip" ->
      ("SELECT * FROM (" +
        "SELECT CAST(-1 AS BIGINT) AS doc_id, 'manual' AS source, CAST(0 AS BIGINT) AS n_chars " +
        "UNION ALL SELECT doc_id, source, n_chars FROM documents) " +
        "ORDER BY doc_id"),

    "q_stream_insert" ->
      ("SELECT doc_id, upper(source) AS src, n_chars FROM documents " +
        "WHERE n_chars > 100 ORDER BY doc_id"),

    // the streamed search ladder == the exact dot top-3 per query (the
    // q_sql_topk oracle restricted to the streamed query set); ties
    // break by ascending STRINGIFIED content like the in-mem corpus heap
    "q_stream_search" ->
      ("SELECT query_id, match_id, CAST(rnk AS INTEGER) AS rank FROM (" +
        "SELECT q.vec_id AS query_id, c.vec_id AS match_id, " +
        "row_number() OVER (PARTITION BY q.vec_id " +
        "ORDER BY list_dot_product(q.embedding, c.embedding) DESC, " +
        "CAST(c.vec_id AS VARCHAR)) AS rnk " +
        "FROM embeddings q, embeddings c WHERE q.vec_id % 20 = 0) " +
        "WHERE rnk <= 3 ORDER BY query_id, rank"),

    "q_compacted_topic" ->
      ("SELECT user_id, event_type, value, epoch_us(ts) AS ts_us, event_id FROM (" +
        "SELECT e.*, row_number() OVER (" +
        "PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn " +
        "FROM events e) WHERE rn = 1 AND user_id <> 7 ORDER BY user_id"),

    "q_model_describe" ->
      ("SELECT * FROM (VALUES " +
        "('vector_encoding', 1, true, 'embedding', 'STRING', 'ARRAY<FLOAT>', 'dim=64,provider=hash'), " +
        "('retail_assistant', 1, true, 'chat', 'STRING', 'STRING', " +
        "'provider=stub,system_prompt=You are a retail assistant')" +
        ") AS t(name, version, is_default, task, input, output, options) " +
        "ORDER BY name, version"),

    "q_model_alter" ->
      ("SELECT * FROM (VALUES " +
        "('retail_assistant', 1, false, 'classification', 'STRING', 'STRING', " +
        "'openai.connection=openai-llm-connection,provider=openai,task=classification'), " +
        "('retail_assistant', 2, true, 'classification', 'STRING', 'STRING', " +
        "'openai.connection=openai-llm-connection,provider=openai,task=classification'), " +
        "('retail_assistant', 3, false, 'classification', 'STRING', 'STRING', " +
        "'openai.connection=openai-llm-connection,provider=openai,task=classification')" +
        ") AS t(name, version, is_default, task, input, output, options) " +
        "ORDER BY version"),

    "q_connection_describe" ->
      ("SELECT * FROM (VALUES " +
        "('mongodb-connection', 'mongodb', 'aws', 'us-west-2', '', " +
        "'${atlas_endpoint}', 'password=<hidden>,username=<hidden>'), " +
        "('mongodb-fed-search-connection', 'mongodb', 'aws', 'us-west-2', " +
        "'my-environment-id', '${atlas_endpoint}', 'password=<hidden>,username=<hidden>'), " +
        "('openai-llm-connection', 'openai', 'aws', 'us-west-2', 'my-env-id', " +
        "'https://api.openai.com/v1/chat/completions', 'api-key=<hidden>'), " +
        "('openai-vector-connection', 'openai', 'aws', 'us-west-2', 'my-env-id', " +
        "'https://api.openai.com/v1/embeddings', 'api-key=<hidden>')" +
        ") AS t(name, type, cloud, region, environment, endpoint, credentials) " +
        "ORDER BY name"),

    "q_error_transcripts" ->
      ("SELECT * FROM (VALUES " +
        "('degenerate_row_type', 'IllegalArgumentException', 'ROW<>'), " +
        "('model_404', 'ModelNotFoundException', 'model no_such_model not found'), " +
        "('model_version_404', 'ModelNotFoundException', 'version 9 not found'), " +
        "('num_candidates_cap', 'IllegalArgumentException', " +
        "'numCandidates must be in [1, 10000]'), " +
        "('sink_schema_mismatch', 'IllegalArgumentException', 'schema mismatch'), " +
        "('strict_produce_reject', 'IllegalArgumentException', " +
        "'additionalProperties=false'), " +
        "('unknown_corpus', 'IllegalArgumentException', 'unknown search corpus'), " +
        "('unknown_metric', 'IllegalArgumentException', 'unknown metric manhattan'), " +
        "('lease_held', 'IllegalStateException', 'compaction already in progress'), " +
        "('lease_usurped', 'IllegalStateException', 'usurped by another compactor'), " +
        "('delete_missing_store', 'IllegalArgumentException', " +
        "'does not exist or is unreachable'), " +
        "('payload_reserved', 'IllegalArgumentException', " +
        "'collides with a reserved store column'), " +
        "('filtered_overfetch', 'IllegalArgumentException', " +
        "'overFetch must be >= 1'), " +
        "('radius_bad_args', 'IllegalArgumentException', " +
        "'RADIUS_SEARCH expects'), " +
        "('radius_bad_threshold', 'IllegalArgumentException', " +
        "'threshold must be numeric'), " +
        "('radius_unknown_corpus', 'IllegalArgumentException', " +
        "'unknown search corpus'), " +
        "('filtered_pred_unresolved', 'IllegalArgumentException', " +
        "'does not resolve against')" +
        ") AS t(case_name, error_class, detail) ORDER BY case_name"),

    "q_insert_values" ->
      ("SELECT * FROM (VALUES " +
        "('user', 'Find me a pair of mens formal shoes in medium size.', 'abc256', " +
        "'[{\"content\":\"Blue Medium Adult Male Shoes, product_id: 101\"}," +
        "{\"content\":\"Blue Medium Adult Female Shoes, product_id: 102\"}]'), " +
        "('user', 'Waterproof hiking boots', 'abc257', " +
        "'[{\"content\":\"Trail boots, product_id: 201\"}]')" +
        ") AS t(role, content, sessionid, products_json) " +
        "ORDER BY sessionid"),

    "q_topic_describe" ->
      ("SELECT * FROM (VALUES " +
        "('key', 'binary', true, 'BUCKET KEY'), " +
        "('product_id', 'bigint', true, ''), " +
        "('name', 'string', true, '')" +
        ") AS t(col_name, data_type, nullable, extras) ORDER BY col_name"),

    "q_model_pin" ->
      ("SELECT doc_id, TRUE AS pin_eq_default FROM documents ORDER BY doc_id"),

    "q_pq_recall" ->
      ("SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings " +
        "WHERE vec_id % 20 = 0 ORDER BY query_id"),

    "q_sq_recall" ->
      ("SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings " +
        "WHERE vec_id % 20 = 0 ORDER BY query_id"),

    "q_bq_recall" ->
      ("SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings " +
        "WHERE vec_id % 20 = 0 ORDER BY query_id"),

    // BM25 top-10: the oracle replays tokenize -> tf/df/corpus stats ->
    // the exact Lucene-parameterized formula (same association), rounds
    // to 4 like the operator, and ranks over the rounded score.
    "q_bm25_topk" ->
      ("WITH " + LexQueriesCte + ", " + Bm25Cte + " " +
        "SELECT query_id, match_id, score, CAST(rnk AS INTEGER) AS rank FROM (" +
        "SELECT query_id, doc_id AS match_id, score, row_number() OVER (" +
        "PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk FROM bsc) " +
        "WHERE rnk <= 10 ORDER BY query_id, rank"),

    // the per-term frame behind the score chain, identical associations
    // (idf's parenthesization, the folded (1 - 0.75) = 0.25, rounds only
    // at the emitted factors)
    "q_bm25_explain" ->
      ("WITH " + LexQueriesCte + ", " + Bm25Cte + " " +
        "SELECT query_id, f.doc_id AS match_id, f.tok AS term, " +
        "CAST(f.tf AS BIGINT) AS tf, CAST(f.dl AS BIGINT) AS dl, " +
        "CAST(d.df AS BIGINT) AS df, " +
        "round(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)), 4) AS idf, " +
        "round(f.tf * (1.2 + 1) / (f.tf + 1.2 * (1 - 0.75 + 0.75 * f.dl / s.avgdl)), 4) AS tf_norm, " +
        "round(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * " +
        "(f.tf * (1.2 + 1) / (f.tf + 1.2 * (1 - 0.75 + 0.75 * f.dl / s.avgdl))), 4) AS contribution " +
        "FROM btf f JOIN bdf d USING (tok) CROSS JOIN bst s " +
        "ORDER BY query_id, match_id, term"),

    // index-served filtered ≡ corpus-scored filtered: the oracle is
    // q_bm25_filtered's verbatim (the q_bm25_indexed idiom)
    "q_bm25_indexed_filtered" ->
      ("WITH " + LexQueriesCte + ", " + Bm25Cte + " " +
        "SELECT query_id, match_id, score, CAST(rnk AS INTEGER) AS rank FROM (" +
        "SELECT query_id, sc.doc_id AS match_id, score, row_number() OVER (" +
        "PARTITION BY query_id ORDER BY score DESC, sc.doc_id) AS rnk " +
        "FROM bsc sc JOIN documents d ON sc.doc_id = d.doc_id " +
        "WHERE d.lang = 'en') " +
        "WHERE rnk <= 10 ORDER BY query_id, rank"),

    // same global-stats scoring chain; the lang filter applies at
    // ranking time only (Lucene filtered-query semantics)
    "q_bm25_filtered" ->
      ("WITH " + LexQueriesCte + ", " + Bm25Cte + " " +
        "SELECT query_id, match_id, score, CAST(rnk AS INTEGER) AS rank FROM (" +
        "SELECT query_id, sc.doc_id AS match_id, score, row_number() OVER (" +
        "PARTITION BY query_id ORDER BY score DESC, sc.doc_id) AS rnk " +
        "FROM bsc sc JOIN documents d ON sc.doc_id = d.doc_id " +
        "WHERE d.lang = 'en') " +
        "WHERE rnk <= 10 ORDER BY query_id, rank"),

    // PRF: pass-1 scoring (prefix b), feedback top-5, term mining with
    // the NOT EXISTS original-term exclusion and (count desc, term)
    // rank, expanded query UNION, pass-2 scoring (prefix e, reusing the
    // b tokenize), final top-10 over the rounded pass-2 score.
    "q_bm25_prf" ->
      ("WITH " + LexQueriesCte + ", " + bm25CteFor("q", "b") + ", " +
        "fb AS (SELECT query_id, doc_id FROM (" +
        "SELECT query_id, doc_id, row_number() OVER (" +
        "PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk FROM bsc) " +
        "WHERE rnk <= 5), " +
        "ft AS (SELECT f.query_id, t.tok, count(*) AS c " +
        "FROM btok t JOIN fb f USING (doc_id) GROUP BY 1, 2), " +
        "mined AS (SELECT query_id, tok AS term FROM (" +
        "SELECT ft.query_id, ft.tok, ft.c, row_number() OVER (" +
        "PARTITION BY ft.query_id ORDER BY ft.c DESC, ft.tok) AS r FROM ft " +
        "WHERE NOT EXISTS (SELECT 1 FROM q " +
        "WHERE q.query_id = ft.query_id AND q.term = ft.tok)) WHERE r <= 3), " +
        "q2(query_id, term) AS (SELECT query_id, term FROM q " +
        "UNION SELECT query_id, term FROM mined), " +
        bm25CteFor("q2", "e", base = "b") + " " +
        "SELECT query_id, match_id, score, CAST(rnk AS INTEGER) AS rank FROM (" +
        "SELECT query_id, doc_id AS match_id, score, row_number() OVER (" +
        "PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk FROM esc) " +
        "WHERE rnk <= 10 ORDER BY query_id, rank"),

    // the same two-pass replay with the lang filter applied at RANKING
    // time in BOTH passes (global stats — the filtered-query chain)
    "q_bm25_prf_filtered" ->
      ("WITH " + LexQueriesCte + ", " + bm25CteFor("q", "b") + ", " +
        "fb AS (SELECT query_id, doc_id FROM (" +
        "SELECT query_id, sc.doc_id, row_number() OVER (" +
        "PARTITION BY query_id ORDER BY score DESC, sc.doc_id) AS rnk " +
        "FROM bsc sc JOIN documents d ON sc.doc_id = d.doc_id " +
        "WHERE d.lang = 'en') WHERE rnk <= 5), " +
        "ft AS (SELECT f.query_id, t.tok, count(*) AS c " +
        "FROM btok t JOIN fb f USING (doc_id) GROUP BY 1, 2), " +
        "mined AS (SELECT query_id, tok AS term FROM (" +
        "SELECT ft.query_id, ft.tok, ft.c, row_number() OVER (" +
        "PARTITION BY ft.query_id ORDER BY ft.c DESC, ft.tok) AS r FROM ft " +
        "WHERE NOT EXISTS (SELECT 1 FROM q " +
        "WHERE q.query_id = ft.query_id AND q.term = ft.tok)) WHERE r <= 3), " +
        "q2(query_id, term) AS (SELECT query_id, term FROM q " +
        "UNION SELECT query_id, term FROM mined), " +
        bm25CteFor("q2", "e", base = "b") + " " +
        "SELECT query_id, match_id, score, CAST(rnk AS INTEGER) AS rank FROM (" +
        "SELECT query_id, sc.doc_id AS match_id, score, row_number() OVER (" +
        "PARTITION BY query_id ORDER BY score DESC, sc.doc_id) AS rnk " +
        "FROM esc sc JOIN documents d ON sc.doc_id = d.doc_id " +
        "WHERE d.lang = 'en') " +
        "WHERE rnk <= 10 ORDER BY query_id, rank"),

    // Index-served BM25 is semantically identical to direct BM25 — the
    // oracle is q_bm25_topk's, and a hash match proves the persisted
    // artifacts (postings + summed stats partials) reproduce corpus
    // scoring exactly.
    "q_bm25_indexed" ->
      ("WITH " + LexQueriesCte + ", " + Bm25Cte + " " +
        "SELECT query_id, match_id, score, CAST(rnk AS INTEGER) AS rank FROM (" +
        "SELECT query_id, doc_id AS match_id, score, row_number() OVER (" +
        "PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk FROM bsc) " +
        "WHERE rnk <= 10 ORDER BY query_id, rank"),

    // delete under the hash: BM25 from scratch over the SURVIVING
    // corpus (the tokenize CTE reads the survivor subquery, so n, avgdl,
    // df, and every score are the post-delete constants), each expected
    // row twice — once per lifecycle phase
    "q_bm25_delete" ->
      ("WITH " + LexQueriesCte + ", " +
        bm25CteFor("q", "d",
          src = "(SELECT * FROM documents WHERE doc_id % 10 <> 0)") + " " +
        "SELECT p.phase, query_id, match_id, score, CAST(rnk AS INTEGER) AS rank " +
        "FROM (SELECT query_id, doc_id AS match_id, score, row_number() OVER (" +
        "PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk FROM dsc), " +
        "(VALUES ('served'), ('compacted')) AS p(phase) " +
        "WHERE rnk <= 10 ORDER BY phase, query_id, rank"),

    // the maintained (build → append → compact) index serves the exact
    // same scores — q_bm25_indexed's oracle verbatim
    "q_bm25_compacted" ->
      ("WITH " + LexQueriesCte + ", " + Bm25Cte + " " +
        "SELECT query_id, match_id, score, CAST(rnk AS INTEGER) AS rank FROM (" +
        "SELECT query_id, doc_id AS match_id, score, row_number() OVER (" +
        "PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk FROM bsc) " +
        "WHERE rnk <= 10 ORDER BY query_id, rank"),

    // RRF fusion: cosine top-20 (queries = vec_id 0..2) fused with BM25
    // top-20 over the SAME id space (doc_id == vec_id in the test
    // corpus); the fused score adds the vector quotient first, exactly
    // like the operator.
    "q_hybrid_rrf" ->
      ("WITH " + LexQueriesCte + ", " + Bm25Cte + ", " +
        "vr AS (SELECT query_id, match_id, rnk FROM (" +
        "SELECT q2.vec_id AS query_id, c.vec_id AS match_id, row_number() OVER (" +
        "PARTITION BY q2.vec_id ORDER BY list_cosine_similarity(q2.embedding, c.embedding) DESC, c.vec_id) AS rnk " +
        "FROM embeddings q2, embeddings c WHERE q2.vec_id <= 2) WHERE rnk <= 20), " +
        "lr AS (SELECT query_id, match_id, rnk FROM (" +
        "SELECT query_id, doc_id AS match_id, row_number() OVER (" +
        "PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk FROM bsc) WHERE rnk <= 20), " +
        "fused AS (SELECT coalesce(vr.query_id, lr.query_id) AS query_id, " +
        "coalesce(vr.match_id, lr.match_id) AS match_id, " +
        "coalesce(CAST(1.0 AS DOUBLE) / (60 + vr.rnk), 0) + " +
        "coalesce(CAST(1.0 AS DOUBLE) / (60 + lr.rnk), 0) AS rrf " +
        "FROM vr FULL OUTER JOIN lr ON vr.query_id = lr.query_id AND vr.match_id = lr.match_id) " +
        "SELECT query_id, match_id, CAST(r AS INTEGER) AS rrf_rank FROM (" +
        "SELECT query_id, match_id, row_number() OVER (" +
        "PARTITION BY query_id ORDER BY rrf DESC, match_id) AS r FROM fused) " +
        "WHERE r <= 5 ORDER BY query_id, rrf_rank"),

    // both legs filtered before fusion; the BM25 leg's scores stay
    // global-stats (the Lucene filtered-query law)
    "q_hybrid_filtered" ->
      ("WITH " + LexQueriesCte + ", " + Bm25Cte + ", " +
        "vr AS (SELECT query_id, match_id, rnk FROM (" +
        "SELECT q2.vec_id AS query_id, c.vec_id AS match_id, row_number() OVER (" +
        "PARTITION BY q2.vec_id ORDER BY list_cosine_similarity(q2.embedding, c.embedding) DESC, c.vec_id) AS rnk " +
        "FROM embeddings q2, embeddings c WHERE q2.vec_id <= 2 " +
        "AND c.label % 4 = 1) WHERE rnk <= 20), " +
        "lr AS (SELECT query_id, match_id, rnk FROM (" +
        "SELECT query_id, sc.doc_id AS match_id, row_number() OVER (" +
        "PARTITION BY query_id ORDER BY score DESC, sc.doc_id) AS rnk " +
        "FROM bsc sc JOIN documents d ON sc.doc_id = d.doc_id " +
        "WHERE d.lang = 'en') WHERE rnk <= 20), " +
        "fused AS (SELECT coalesce(vr.query_id, lr.query_id) AS query_id, " +
        "coalesce(vr.match_id, lr.match_id) AS match_id, " +
        "coalesce(CAST(1.0 AS DOUBLE) / (60 + vr.rnk), 0) + " +
        "coalesce(CAST(1.0 AS DOUBLE) / (60 + lr.rnk), 0) AS rrf " +
        "FROM vr FULL OUTER JOIN lr ON vr.query_id = lr.query_id AND vr.match_id = lr.match_id) " +
        "SELECT query_id, match_id, CAST(r AS INTEGER) AS rrf_rank FROM (" +
        "SELECT query_id, match_id, row_number() OVER (" +
        "PARTITION BY query_id ORDER BY rrf DESC, match_id) AS r FROM fused) " +
        "WHERE r <= 5 ORDER BY query_id, rrf_rank"),

    // index-served hybrid ≡ corpus-scored hybrid: the oracle is
    // q_hybrid_rrf's verbatim — the row asserts the persisted lexical
    // artifacts change nothing about the fused ranking
    "q_hybrid_indexed" ->
      ("WITH " + LexQueriesCte + ", " + Bm25Cte + ", " +
        "vr AS (SELECT query_id, match_id, rnk FROM (" +
        "SELECT q2.vec_id AS query_id, c.vec_id AS match_id, row_number() OVER (" +
        "PARTITION BY q2.vec_id ORDER BY list_cosine_similarity(q2.embedding, c.embedding) DESC, c.vec_id) AS rnk " +
        "FROM embeddings q2, embeddings c WHERE q2.vec_id <= 2) WHERE rnk <= 20), " +
        "lr AS (SELECT query_id, match_id, rnk FROM (" +
        "SELECT query_id, doc_id AS match_id, row_number() OVER (" +
        "PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk FROM bsc) WHERE rnk <= 20), " +
        "fused AS (SELECT coalesce(vr.query_id, lr.query_id) AS query_id, " +
        "coalesce(vr.match_id, lr.match_id) AS match_id, " +
        "coalesce(CAST(1.0 AS DOUBLE) / (60 + vr.rnk), 0) + " +
        "coalesce(CAST(1.0 AS DOUBLE) / (60 + lr.rnk), 0) AS rrf " +
        "FROM vr FULL OUTER JOIN lr ON vr.query_id = lr.query_id AND vr.match_id = lr.match_id) " +
        "SELECT query_id, match_id, CAST(r AS INTEGER) AS rrf_rank FROM (" +
        "SELECT query_id, match_id, row_number() OVER (" +
        "PARTITION BY query_id ORDER BY rrf DESC, match_id) AS r FROM fused) " +
        "WHERE r <= 5 ORDER BY query_id, rrf_rank"),

    "q_rag_hybrid_contract" ->
      ("SELECT doc_id, TRUE AS products_k_ok, TRUE AS products_from_corpus_ok, " +
        "TRUE AS prompt_role_ok, TRUE AS response_ok " +
        "FROM documents WHERE doc_id % 20 = 0 ORDER BY doc_id"),

    "q_hard_negatives" ->
      ("SELECT query_id, match_id, CAST(rnk AS INTEGER) AS rank FROM (" +
        "SELECT q.vec_id AS query_id, c.vec_id AS match_id, " +
        "row_number() OVER (PARTITION BY q.vec_id " +
        "ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id) AS rnk " +
        "FROM embeddings q, embeddings c " +
        "WHERE q.vec_id % 25 = 0 AND q.label <> c.label) WHERE rnk <= 5 " +
        "ORDER BY query_id, rank"),

    "q_maxsim_ann_recall" ->
      ("SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings " +
        "WHERE vec_id % 25 = 0 ORDER BY query_id"),

    "q_maxsim_index_recall" ->
      ("SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings " +
        "WHERE vec_id % 25 = 0 ORDER BY query_id"),

    "q_winnow_pairs" ->
      ("WITH s AS (SELECT doc_id AS id, " +
        "regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS st FROM documents), " +
        "g AS (SELECT id, CAST(i AS BIGINT) AS pos, " +
        "substr(st, CAST(i AS INTEGER), 5) AS gram, len(st) - 4 AS ngrams " +
        "FROM (SELECT id, st, unnest(range(1, len(st) - 3)) AS i FROM s " +
        "WHERE len(st) >= 8)), " +
        "m AS (SELECT id, pos, ngrams, " +
        "min(gram || lpad(CAST(pos AS VARCHAR), 10, '0')) OVER (" +
        "PARTITION BY id ORDER BY pos ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wm " +
        "FROM g), " +
        "fp AS (SELECT DISTINCT id, substr(wm, 1, 5) AS gram FROM m " +
        "WHERE pos <= ngrams - 3), " +
        "sized AS (SELECT gram FROM fp GROUP BY gram HAVING count(*) <= 20), " +
        "kept AS (SELECT fp.id, fp.gram FROM fp JOIN sized USING (gram)) " +
        "SELECT id1, id2, CAST(n_shared AS BIGINT) AS n_shared FROM (" +
        "SELECT a.id AS id1, b.id AS id2, count(*) AS n_shared " +
        "FROM kept a JOIN kept b ON a.gram = b.gram AND a.id < b.id " +
        "GROUP BY 1, 2) WHERE n_shared >= 2 ORDER BY id1, id2"),

    // winnowing: grams at every position, the (gram ++ zero-padded pos)
    // sortable encoding, window minima over full w-windows, distinct
    "q_winnow" ->
      ("WITH s AS (SELECT doc_id AS id, " +
        "regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS st FROM documents), " +
        "g AS (SELECT id, CAST(i AS BIGINT) AS pos, " +
        "substr(st, CAST(i AS INTEGER), 5) AS gram, len(st) - 4 AS ngrams " +
        "FROM (SELECT id, st, unnest(range(1, len(st) - 3)) AS i FROM s " +
        "WHERE len(st) >= 8)), " +
        "m AS (SELECT id, pos, ngrams, " +
        "min(gram || lpad(CAST(pos AS VARCHAR), 10, '0')) OVER (" +
        "PARTITION BY id ORDER BY pos ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wm " +
        "FROM g) " +
        "SELECT DISTINCT id, CAST(substr(wm, 6, 10) AS BIGINT) AS pos, " +
        "substr(wm, 1, 5) AS gram FROM m WHERE pos <= ngrams - 3 " +
        "ORDER BY id, pos"),

    "q_maxsim_topk" ->
      ("SELECT query_id, match_group, CAST(rnk AS INTEGER) AS rank FROM (" +
        "SELECT query_id, match_group, row_number() OVER (" +
        "PARTITION BY query_id ORDER BY best DESC, match_group) AS rnk FROM (" +
        "SELECT q.vec_id AS query_id, CAST(c.label AS BIGINT) AS match_group, " +
        "max(list_cosine_similarity(q.embedding, c.embedding)) AS best " +
        "FROM embeddings q, embeddings c WHERE q.vec_id % 25 = 0 " +
        "GROUP BY 1, 2)) WHERE rnk <= 3 ORDER BY query_id, rank"),

    // triples: positives = same-label non-self cosine ranking,
    // negatives = different-label ranking, joined on rank
    "q_contrastive_triples" ->
      ("WITH sc AS (SELECT q.vec_id AS query_id, q.label AS qlab, " +
        "c.vec_id AS match_id, c.label AS clab, " +
        "list_cosine_similarity(q.embedding, c.embedding) AS s " +
        "FROM embeddings q, embeddings c WHERE q.vec_id % 25 = 0), " +
        "pos AS (SELECT query_id, match_id AS pos_id, rnk FROM (" +
        "SELECT query_id, match_id, row_number() OVER (PARTITION BY query_id " +
        "ORDER BY s DESC, match_id) AS rnk FROM sc " +
        "WHERE clab = qlab AND match_id <> query_id) WHERE rnk <= 3), " +
        "neg AS (SELECT query_id, match_id AS neg_id, rnk FROM (" +
        "SELECT query_id, match_id, row_number() OVER (PARTITION BY query_id " +
        "ORDER BY s DESC, match_id) AS rnk FROM sc " +
        "WHERE clab <> qlab) WHERE rnk <= 3) " +
        "SELECT query_id, pos_id, neg_id, CAST(rnk AS INTEGER) AS pair_rank " +
        "FROM pos JOIN neg USING (query_id, rnk) " +
        "ORDER BY query_id, pair_rank"),

    "q_length_batches" ->
      ("WITH b AS (SELECT source AS stratum, doc_id, " +
        "CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> len(t) > 0)) AS BIGINT) AS n_tok " +
        "FROM documents), " +
        "r AS (SELECT stratum, n_tok, CAST((row_number() OVER (" +
        "PARTITION BY stratum ORDER BY n_tok DESC, doc_id) - 1) // 32 AS BIGINT) AS batch_id FROM b) " +
        "SELECT stratum, batch_id, count(*) AS n_docs, max(n_tok) AS max_tok, " +
        "CAST(sum(n_tok) AS BIGINT) AS sum_tok, " +
        "count(*) * max(n_tok) - CAST(sum(n_tok) AS BIGINT) AS pad_waste " +
        "FROM r GROUP BY stratum, batch_id ORDER BY stratum, batch_id"),

    "q_datasheet" ->
      ("WITH b AS (SELECT source AS stratum, " +
        "len(list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> len(t) > 0)) AS nt, " +
        "len(text) AS l FROM documents), " +
        "per AS (SELECT stratum, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens, " +
        "list_sort(list(l)) AS sorted FROM b GROUP BY stratum), " +
        "tot AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS total FROM per) " +
        "SELECT stratum, n_docs, n_tokens, " +
        "round(CAST(n_tokens AS DOUBLE) / n_docs, 4) AS mean_tok, " +
        "CAST(sorted[CAST(ceil(CAST(0.5 AS DOUBLE) * n_docs) AS INTEGER)] AS BIGINT) AS p50_len, " +
        "CAST(sorted[CAST(ceil(CAST(0.9 AS DOUBLE) * n_docs) AS INTEGER)] AS BIGINT) AS p90_len, " +
        "round(n_docs / total, 4) AS share " +
        "FROM per CROSS JOIN tot ORDER BY stratum"),

    // BPE head merge: the oracle replays word-type counts, every
    // adjacent character pair weighted by type count, and the
    // (count desc, lexicographic) argmax.
    // unigram-LM candidate inventory: substring frequencies weighted by
    // word-type counts, top-50 by (freq desc, piece asc) union ALL
    // single chars, distinct — replayed relationally
    "q_ulm_candidates" ->
      ("WITH wc AS (SELECT word, count(*) AS cnt FROM (" +
        "SELECT unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0)) AS word " +
        "FROM documents) GROUP BY word), " +
        "p AS (SELECT substr(word, CAST(i AS INTEGER), CAST(l AS INTEGER)) AS piece, cnt " +
        "FROM (SELECT word, cnt, l, unnest(range(1, len(word) - CAST(l AS INTEGER) + 2)) AS i " +
        "FROM (SELECT word, cnt, unnest(range(1, least(4, len(word)) + 1)) AS l FROM wc))), " +
        "f AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS freq FROM p GROUP BY piece), " +
        "top AS (SELECT piece, freq FROM f ORDER BY freq DESC, piece LIMIT 50), " +
        "chars AS (SELECT piece, freq FROM f WHERE len(piece) = 1) " +
        "SELECT DISTINCT piece, freq FROM (SELECT * FROM top UNION ALL SELECT * FROM chars) " +
        "ORDER BY piece"),

    "q_ulm_encode" ->
      ("SELECT doc_id, CAST(CASE WHEN len(trim(text)) = 0 THEN 0 " +
        "ELSE len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0)) END AS BIGINT) AS n_words, " +
        "TRUE AS roundtrip_ok, TRUE AS pieces_ok FROM documents ORDER BY doc_id"),

    "q_bpe_merge_head" ->
      ("WITH wc AS (SELECT word, count(*) AS cnt FROM (" +
        "SELECT unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0)) AS word " +
        "FROM documents) GROUP BY word), " +
        "p AS (SELECT substr(word, CAST(i AS INTEGER), 1) AS lhs, " +
        "substr(word, CAST(i AS INTEGER) + 1, 1) AS rhs, sum(cnt) AS c " +
        "FROM (SELECT word, cnt, unnest(range(1, len(word))) AS i FROM wc) " +
        "GROUP BY 1, 2) " +
        "SELECT CAST(0 AS INTEGER) AS rank, lhs, rhs FROM p " +
        "ORDER BY c DESC, lhs, rhs LIMIT 1"),

    "q_bpe_contract" ->
      ("SELECT CAST(i AS INTEGER) AS rank, TRUE AS substring_ok, " +
        "TRUE AS construct_ok FROM generate_series(0, 29) t(i) ORDER BY rank"),

    "q_bpe_tokens_contract" ->
      ("SELECT doc_id, TRUE AS bounds_ok FROM documents ORDER BY doc_id"),

    // WordPiece first merge: replay word types -> per-char counts ->
    // adjacent-pair counts -> argmax of the IEEE-double likelihood
    // ratio pcnt/(lcnt*rcnt) with the (score desc, lhs, rhs) order.
    // Long counts < 2^53 cast exactly; /,* are correctly rounded, so
    // the double is bit-identical to the Scala trainer's.
    "q_wp_head" ->
      ("WITH wc AS (SELECT word, count(*) AS cnt FROM (" +
        "SELECT unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0)) AS word " +
        "FROM documents) GROUP BY word), " +
        "pos AS (SELECT word, cnt, CAST(i AS INTEGER) AS i " +
        "FROM (SELECT word, cnt, unnest(range(1, len(word) + 1)) AS i FROM wc)), " +
        "cc AS (SELECT substr(word, i, 1) AS c, sum(cnt) AS ccnt FROM pos GROUP BY 1), " +
        "p AS (SELECT substr(word, i, 1) AS lhs, substr(word, i + 1, 1) AS rhs, sum(cnt) AS pcnt " +
        "FROM pos WHERE i < len(word) GROUP BY 1, 2) " +
        "SELECT CAST(0 AS INTEGER) AS rank, lhs, rhs FROM p " +
        "JOIN cc cl ON cl.c = p.lhs JOIN cc cr ON cr.c = p.rhs " +
        "ORDER BY CAST(pcnt AS DOUBLE) / (CAST(cl.ccnt AS DOUBLE) * CAST(cr.ccnt AS DOUBLE)) DESC, lhs, rhs " +
        "LIMIT 1"),

    "q_wp_contract" ->
      ("SELECT CAST(i AS INTEGER) AS rank, TRUE AS substring_ok, " +
        "TRUE AS construct_ok FROM generate_series(0, 29) t(i) ORDER BY rank"),

    "q_wp_tokens_contract" ->
      ("SELECT doc_id, TRUE AS bounds_ok FROM documents ORDER BY doc_id"),

    // C4 rules: replay the 6-token-line construction, the index-keyed
    // punctuation CASE, each line verdict (terminal punct + >= 3 words
    // + no javascript), the [.!?] sentence proxy over kept lines, the
    // page flags, and the ordered rebuild (coalesced to '' when every
    // line drops, matching concat_ws over the empty array).
    "q_c4_clean" ->
      ("WITH lined AS (SELECT doc_id, array_to_string(" +
        "[array_to_string(tk[i*6+1:i*6+6], ' ') " +
        "FOR i IN range(0, greatest(CAST(ceil(len(tk)/6.0) AS INT), 1))], chr(10)) AS text_lined " +
        "FROM (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> len(t) > 0) AS tk FROM documents)), " +
        "plined AS (SELECT doc_id, array_to_string([CASE " +
        "WHEN doc_id % 41 = 0 AND i = 1 THEN 'lorem ipsum dolor.' " +
        "WHEN doc_id % 37 = 0 AND i = 0 THEN sp[i+1] || ' {' " +
        "WHEN (doc_id + i) % 29 = 0 THEN sp[i+1] || ' javascript.' " +
        "WHEN (doc_id + i) % 3 <> 0 THEN sp[i+1] || '.' " +
        "ELSE sp[i+1] END FOR i IN range(0, len(sp))], chr(10)) AS text_lined " +
        "FROM (SELECT doc_id, string_split(text_lined, chr(10)) AS sp FROM lined)), " +
        "lines AS (SELECT doc_id, CAST(i AS INTEGER) AS pos, sp[CAST(i AS INTEGER)+1] AS line " +
        "FROM (SELECT doc_id, string_split(text_lined, chr(10)) AS sp FROM plined), " +
        "UNNEST(range(0, len(sp))) r(i)), " +
        "j AS (SELECT doc_id, pos, line, " +
        "regexp_matches(line, '[.!?\"]$') " +
        "AND len(list_filter(regexp_split_to_array(trim(line), '[ \\t\\f\\r]+'), t -> len(t) > 0)) >= 3 " +
        "AND NOT regexp_matches(lower(line), '\\bjavascript\\b') AS keep FROM lines), " +
        "agg AS (SELECT doc_id, count(*) AS n_lines, " +
        "sum(CASE WHEN keep THEN 1 ELSE 0 END) AS n_kept, " +
        "sum(CASE WHEN keep THEN len(regexp_extract_all(line, '[.!?]')) ELSE 0 END) AS n_sentences, " +
        "coalesce(string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY pos), '') AS clean_text " +
        "FROM j GROUP BY doc_id), " +
        "fl AS (SELECT doc_id, contains(lower(text_lined), 'lorem ipsum') AS has_lorem, " +
        "contains(text_lined, '{') AS has_brace FROM plined) " +
        "SELECT agg.doc_id, CAST(n_lines AS BIGINT) AS n_lines, " +
        "CAST(n_kept AS BIGINT) AS n_kept, CAST(n_sentences AS BIGINT) AS n_sentences, " +
        "has_lorem, has_brace, " +
        "(NOT has_lorem AND NOT has_brace AND n_sentences >= 3) AS kept_page, clean_text " +
        "FROM agg JOIN fl ON agg.doc_id = fl.doc_id ORDER BY agg.doc_id"),

    // Retrieval metrics: the oracle replays the cosine top-10, the label
    // relevance join, the per-label corpus counts, and the ideal-DCG
    // prefix (ascending cumsum over generate_series, the operator's
    // ascending-loop spelling) with the same rounding.
    "q_retrieval_eval" ->
      ("WITH rk AS (SELECT query_id, qlab, match_id, rnk FROM (" +
        "SELECT q.vec_id AS query_id, q.label AS qlab, c.vec_id AS match_id, " +
        "row_number() OVER (PARTITION BY q.vec_id " +
        "ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id) AS rnk " +
        "FROM embeddings q, embeddings c WHERE q.vec_id % 25 = 0) WHERE rnk <= 10), " +
        "hit AS (SELECT rk.query_id, rk.rnk, (e.label = rk.qlab) AS h " +
        "FROM rk JOIN embeddings e ON rk.match_id = e.vec_id), " +
        "lc AS (SELECT label, count(*) AS cnt FROM embeddings GROUP BY label), " +
        "ic AS (SELECT i, sum(CAST(1.0 AS DOUBLE)/log2(i+1)) OVER (ORDER BY i) AS cum " +
        "FROM generate_series(1, 10) t(i)), " +
        "pq AS (SELECT query_id, CAST(sum(CASE WHEN h THEN 1 ELSE 0 END) AS BIGINT) AS n_rel_at_k, " +
        "coalesce(max(CASE WHEN h THEN CAST(1.0 AS DOUBLE)/rnk END), 0.0) AS mrr, " +
        "coalesce(sum(CASE WHEN h THEN CAST(1.0 AS DOUBLE)/log2(rnk+1) END), 0.0) AS dcg " +
        "FROM hit GROUP BY query_id), " +
        "nr AS (SELECT q.vec_id AS query_id, lc.cnt FROM embeddings q " +
        "JOIN lc ON q.label = lc.label WHERE q.vec_id % 25 = 0) " +
        "SELECT pq.query_id, pq.n_rel_at_k, " +
        "round(CAST(pq.n_rel_at_k AS DOUBLE) / 10, 4) AS prec_at_k, " +
        "round(CASE WHEN coalesce(nr.cnt, 0) = 0 THEN 0.0 " +
        "ELSE CAST(pq.n_rel_at_k AS DOUBLE) / nr.cnt END, 4) AS recall_at_k, " +
        "round(pq.mrr, 4) AS mrr, " +
        "round(CASE WHEN coalesce(nr.cnt, 0) = 0 THEN 0.0 ELSE pq.dcg / ic.cum END, 4) AS ndcg " +
        "FROM pq LEFT JOIN nr ON pq.query_id = nr.query_id " +
        "LEFT JOIN ic ON ic.i = least(10, nr.cnt) " +
        "ORDER BY pq.query_id"),

    // MMR: the oracle unrolls the greedy selection (candidates -> pure-
    // relevance pick -> two marginal-score picks) with every cosine CAST
    // to DOUBLE before arithmetic (the operator's expression widens its
    // float32 result to double the same way) and lambda = 0.5 exact.
    "q_mmr_rerank" ->
      ("WITH mcand AS (SELECT query_id, match_id, rel FROM (" +
        "SELECT q.vec_id AS query_id, c.vec_id AS match_id, " +
        "CAST(list_cosine_similarity(q.embedding, c.embedding) AS DOUBLE) AS rel, " +
        "row_number() OVER (PARTITION BY q.vec_id " +
        "ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id) AS rnk " +
        "FROM embeddings q, embeddings c WHERE q.vec_id % 50 = 0) WHERE rnk <= 10), " +
        "cv AS (SELECT mcand.query_id, mcand.match_id, mcand.rel, e.embedding AS v " +
        "FROM mcand JOIN embeddings e ON mcand.match_id = e.vec_id), " +
        "s1 AS (SELECT query_id, match_id, v FROM (SELECT query_id, match_id, v, " +
        "row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, match_id) AS r FROM cv) WHERE r = 1), " +
        "m2 AS (SELECT c.query_id, c.match_id, c.v, " +
        "0.5 * c.rel - 0.5 * CAST(list_cosine_similarity(c.v, s1.v) AS DOUBLE) AS mmr " +
        "FROM cv c JOIN s1 ON c.query_id = s1.query_id AND c.match_id <> s1.match_id), " +
        "s2 AS (SELECT query_id, match_id, v FROM (SELECT query_id, match_id, v, " +
        "row_number() OVER (PARTITION BY query_id ORDER BY mmr DESC, match_id) AS r FROM m2) WHERE r = 1), " +
        "m3 AS (SELECT c.query_id, c.match_id, " +
        "0.5 * c.rel - 0.5 * greatest(" +
        "CAST(list_cosine_similarity(c.v, s1.v) AS DOUBLE), " +
        "CAST(list_cosine_similarity(c.v, s2.v) AS DOUBLE)) AS mmr " +
        "FROM cv c JOIN s1 ON c.query_id = s1.query_id JOIN s2 ON c.query_id = s2.query_id " +
        "WHERE c.match_id <> s1.match_id AND c.match_id <> s2.match_id), " +
        "s3 AS (SELECT query_id, match_id FROM (SELECT query_id, match_id, " +
        "row_number() OVER (PARTITION BY query_id ORDER BY mmr DESC, match_id) AS r FROM m3) WHERE r = 1) " +
        "SELECT query_id, CAST(sr AS INTEGER) AS sel_rank, match_id FROM (" +
        "SELECT query_id, 1 AS sr, match_id FROM s1 " +
        "UNION ALL SELECT query_id, 2 AS sr, match_id FROM s2 " +
        "UNION ALL SELECT query_id, 3 AS sr, match_id FROM s3) " +
        "ORDER BY query_id, sel_rank"),

    // classifier contract: per-doc probability-range boolean plus the
    // corpus-level AUC gate, both pinned TRUE (the recall-contract
    // pattern — a drifting model flips a boolean and fails hash)
    "q_minhash_contract" ->
      (CharShingleCte +
        "SELECT id1, id2, TRUE AS found_ok, TRUE AS precision_all_ok " +
        "FROM j WHERE jac >= 0.8 ORDER BY id1, id2"),

    "q_simhash_contract" ->
      (CharShingleCte +
        "SELECT id1, id2, TRUE AS manku_ok " +
        "FROM j WHERE jac >= 0.9 ORDER BY id1, id2"),

    "q_fingerprint_contract" ->
      ("SELECT doc_id, CAST(count(*) OVER (PARTITION BY " +
        "array_to_string(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), " +
        "t -> len(t) > 0), ' ')) AS BIGINT) AS n_same_fp " +
        "FROM documents ORDER BY doc_id"),

    "q_dedup_pipeline_contract" ->
      (CharShingleCte.dropRight(1) + ", " +
        "paired AS (SELECT id1 AS doc_id FROM j WHERE jac >= 0.3 " +
        "UNION SELECT id2 FROM j WHERE jac >= 0.3) " +
        "SELECT doc_id, doc_id NOT IN (SELECT doc_id FROM paired) AS is_isolated, " +
        "TRUE AS isolated_kept_ok, TRUE AS subset_in_exact_ok " +
        "FROM documents ORDER BY doc_id"),

    "q_incremental_dedup_contract" ->
      (CharShingleCte.dropRight(1) + ", " +
        "cand AS (SELECT id1 AS a, id2 AS b FROM j WHERE jac >= 0.8 " +
        "UNION ALL SELECT id2, id1 FROM j WHERE jac >= 0.8) " +
        "SELECT DISTINCT a AS doc_id, TRUE AS flagged_ok FROM cand " +
        "WHERE a % 2 = 1 AND b % 2 = 0 ORDER BY doc_id"),

    "q_dedup_keepbest_contract" ->
      (CharShingleCte.dropRight(1) + ", " +
        "corpus AS (SELECT doc_id, text FROM documents " +
        "UNION ALL SELECT doc_id + 100000, concat('  ', upper(text), '   ') " +
        "FROM documents WHERE doc_id % 10 = 0), " +
        "qual AS (SELECT doc_id, text, round((" +
        "least(CAST(length(text) AS DOUBLE) / 200.0, 1.0) + " +
        "CASE WHEN (CASE WHEN n_tok = 0 THEN 0.0 ELSE CAST(length(text) AS DOUBLE) / n_tok END) " +
        "BETWEEN 3 AND 12 THEN 1.0 ELSE 0.5 END + " +
        "(1.0 - least((CASE WHEN length(text) = 0 THEN 0.0 ELSE " +
        "CAST(length(text) - length(regexp_replace(text, '[!\"#$%&''()*+,\\-./:;<=>?@\\[\\\\\\]^_`{|}~]', '', 'g')) AS DOUBLE) " +
        "/ length(text) END) * 4.0, 1.0))" +
        ") / 3.0, 4) AS __q FROM (" +
        "SELECT doc_id, text, CAST(CASE WHEN len(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS DOUBLE) AS n_tok " +
        "FROM corpus)), " +
        "grp AS (SELECT doc_id, __q, " +
        "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nk FROM qual), " +
        "keeper AS (SELECT doc_id, " +
        "first_value(doc_id) OVER (PARTITION BY nk ORDER BY __q DESC, doc_id) AS exact_keeper_id, " +
        "min(doc_id) OVER (PARTITION BY nk) AS anchor FROM grp), " +
        "paired AS (SELECT id1 AS a FROM j WHERE jac >= 0.3 " +
        "UNION SELECT id2 FROM j WHERE jac >= 0.3) " +
        "SELECT doc_id, exact_keeper_id, " +
        "anchor NOT IN (SELECT a FROM paired) AS is_isolated, " +
        "TRUE AS survivor_is_keeper_ok, TRUE AS isolated_kept_ok " +
        "FROM keeper ORDER BY doc_id"),

    "q_embedding_lsh_contract" ->
      ("SELECT CAST(count(*) AS BIGINT) AS n_exact, TRUE AS precision_ok, " +
        "TRUE AS recall_ge_60_ok FROM (" +
        "SELECT 1 AS x FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id " +
        "AND list_cosine_similarity(a.embedding, b.embedding) >= 0.35)"),

    "q_media_features_contract" ->
      ("WITH chars AS (SELECT doc_id, ord(substring(text, i, 1)) AS o " +
        "FROM documents, UNNEST(range(1, len(text) + 1)) AS r(i)), " +
        "sums AS (SELECT doc_id, sum(o) AS s, count(*) AS n FROM chars GROUP BY doc_id) " +
        "SELECT d.doc_id AS media_id, " +
        "CASE d.doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind, " +
        "CAST(coalesce(n, 0) AS BIGINT) AS n_bytes, " +
        "CAST(16 + coalesce(s, 0) % 64 AS BIGINT) AS w, " +
        "CAST(CASE WHEN d.doc_id % 3 = 0 THEN 16 + (coalesce(s, 0) // 64) % 64 " +
        "WHEN d.doc_id % 3 = 1 THEN 1 " +
        "ELSE 16 + (coalesce(s, 0) // 64) % 32 END AS BIGINT) AS h, " +
        "CAST(coalesce(s, 0) AS BIGINT) AS byte_sum " +
        "FROM documents d LEFT JOIN sums USING (doc_id) ORDER BY media_id"),
  )

  /** DuckDB CTE chain computing exact character-5-shingle Jaccard pairs
    * over the minhash normalization — ends with relation `j(id1, id2,
    * jac)` and a trailing space. Shared by the sketch-accuracy oracles.
    */
  private val CharShingleCte: String =
    "WITH norm AS (SELECT doc_id, array_to_string(list_filter(" +
      "regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> len(t) > 0), ' ') AS nm " +
      "FROM documents), " +
      "sh AS (SELECT DISTINCT doc_id, substring(nm, i, 5) AS s " +
      "FROM norm, UNNEST(range(1, len(nm) - 3)) AS r(i) WHERE len(nm) >= 5), " +
      "cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), " +
      "common AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c " +
      "FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
      "j AS (SELECT id1, id2, CAST(c AS DOUBLE) / CAST(c1.n + c2.n - c AS DOUBLE) AS jac " +
      "FROM common JOIN cnt c1 ON c1.doc_id = id1 JOIN cnt c2 ON c2.doc_id = id2) "
}
