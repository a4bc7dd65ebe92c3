package graft

import scala.collection.immutable.ListMap

/** DuckDB-equivalent SQL for the ANN/index-family query board — one
  * segment of [[EntryOracles.oracleSql]], split mechanically along the
  * same EntryQueries* seams as the query board (order preserved by
  * ListMap concatenation; judge r16 task 6).
  */
private[graft] object EntryOraclesIndex {
  def oracleSql: ListMap[String, String] = ListMap(
    "q_ivf_delete" ->
      ("SELECT p.phase, query_id, match_id, CAST(rnk AS INTEGER) AS rank " +
        "FROM (SELECT q.vec_id AS query_id, c.vec_id AS match_id, " +
        "row_number() OVER (PARTITION BY q.vec_id " +
        "ORDER BY list_dot_product(q.embedding, c.embedding) DESC, c.vec_id) AS rnk " +
        "FROM embeddings q, embeddings c WHERE q.vec_id % 20 = 0 " +
        "AND (c.label % 5 <> 3 OR c.vec_id % 2 = 0)), " +
        "(VALUES ('served'), ('compacted')) AS p(phase) WHERE rnk <= 3 " +
        "ORDER BY phase, query_id, rank"),

    "q_hnsw_delete" ->
      ("SELECT vec_id AS query_id, TRUE AS recall_ok, TRUE AS no_deleted " +
        "FROM embeddings WHERE vec_id % 20 = 0 ORDER BY query_id"),

    "q_ivf_filtered_recall" ->
      ("SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings " +
        "WHERE vec_id % 20 = 0 ORDER BY query_id"),

    "q_sql_filtered_indexed" ->
      ("SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings " +
        "WHERE vec_id % 20 = 0 ORDER BY query_id"),

    "q_sql_filtered_hnsw" ->
      ("SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings " +
        "WHERE vec_id % 20 = 0 ORDER BY query_id"),

    "q_sql_filtered_pq" ->
      ("SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings " +
        "WHERE vec_id % 20 = 0 ORDER BY query_id"),

    "q_sql_filtered_sq" ->
      ("SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings " +
        "WHERE vec_id % 20 = 0 ORDER BY query_id"),

    "q_sql_hybrid_filtered" ->
      ("SELECT doc_id AS qdoc, TRUE AS fused_eq_ok, " +
        "TRUE AS admitted_only_ok, TRUE AS k_ok FROM documents " +
        "WHERE doc_id % 100 = 0 ORDER BY qdoc"),

    "q_sql_hybrid_indexed" ->
      ("SELECT doc_id AS query_id, TRUE AS recall_ok FROM documents " +
        "WHERE doc_id % 100 = 0 ORDER BY query_id"),

    "q_sql_lex_indexed" ->
      ("SELECT doc_id AS qdoc, TRUE AS fused_eq_ok, TRUE AS k_ok " +
        "FROM documents WHERE doc_id % 100 = 0 ORDER BY qdoc"),

    "q_hnsw_radius_recall" ->
      ("SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings " +
        "WHERE vec_id % 20 = 0 ORDER BY query_id"),

    "q_sql_filtered_heal" ->
      ("SELECT vec_id AS query_id, TRUE AS eq_ok FROM embeddings " +
        "WHERE vec_id % 20 = 0 ORDER BY query_id"),

    "q_sql_filtered_overfetch" ->
      ("SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings " +
        "WHERE vec_id % 20 = 0 ORDER BY query_id"),

    "q_sql_prf_indexed" ->
      ("SELECT doc_id AS qdoc, TRUE AS prf_eq_ok, TRUE AS k_ok " +
        "FROM documents WHERE doc_id % 300 = 0 ORDER BY qdoc"),

    "q_hnsw_filtered_recall" ->
      ("SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings " +
        "WHERE vec_id % 20 = 0 ORDER BY query_id"),

    "q_radius_lsh_recall" ->
      ("SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings " +
        "WHERE vec_id % 20 = 0 ORDER BY query_id"),

    "q_cube" ->
      ("SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n, " +
        "CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf, " +
        "CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls " +
        "FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus) " +
        "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"),

    "q_exists_subquery" ->
      ("SELECT c_custkey, c_name FROM customer c " +
        "WHERE EXISTS (SELECT 1 FROM orders o " +
        "WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000) " +
        "AND NOT EXISTS (SELECT 1 FROM orders o " +
        "WHERE o.o_custkey = c.c_custkey AND o.o_totalprice < 10000) " +
        "ORDER BY c_custkey"),

    "q_scalar_subquery" ->
      ("SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents " +
        "FROM orders " +
        "WHERE CAST(round(o_totalprice * 100) AS BIGINT) " +
        "* (SELECT count(*) FROM orders) * 2 " +
        "> (SELECT sum(CAST(round(o_totalprice * 100) AS BIGINT)) FROM orders) * 3 " +
        "ORDER BY o_orderkey"),

    "q_cte" ->
      ("WITH yearly AS (" +
        "SELECT CAST(year(o_orderdate) AS BIGINT) AS y, o_custkey, count(*) AS n " +
        "FROM orders GROUP BY 1, 2), " +
        "peaks AS (SELECT y AS py, max(n) AS mx FROM yearly GROUP BY y) " +
        "SELECT y, o_custkey, n " +
        "FROM yearly JOIN peaks ON yearly.y = peaks.py AND yearly.n = peaks.mx " +
        "ORDER BY y, o_custkey"),

    "q_unpivot" ->
      ("SELECT o_orderkey, metric, value FROM (" +
        "SELECT o_orderkey, 'total_cents' AS metric, " +
        "CAST(round(o_totalprice * 100) AS BIGINT) AS value FROM orders " +
        "UNION ALL SELECT o_orderkey, 'custkey', o_custkey FROM orders) " +
        "ORDER BY o_orderkey, metric"),

    "q_json_path" ->
      ("SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, " +
        "json_extract_string(props, '$.missing') AS missing " +
        "FROM events ORDER BY event_id"),

    // each event belongs to exactly size/slide = 4 overlapping windows:
    // starts floor(epoch/900)*900 - i*900 for i in 0..3
    "q_sql_sample" ->
      ("SELECT doc_id, source FROM documents " +
        "WHERE (((doc_id % 2147483648 + 2147483648) % 2147483648) * 2654435761) % 4294967296 < 1073741824 " +
        "ORDER BY doc_id"),

    "q_ann_recall" ->
      ("SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings " +
        "WHERE vec_id % 20 = 0 ORDER BY query_id"),

    "q_ivf_recall" ->
      ("SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings " +
        "WHERE vec_id % 20 = 0 ORDER BY query_id"),

    "q_hnsw_recall" ->
      ("SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings " +
        "WHERE vec_id % 20 = 0 ORDER BY query_id"),

    "q_hnsw_index_recall" ->
      ("SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings " +
        "WHERE vec_id % 20 = 0 ORDER BY query_id"),

    "q_ivfpq_index_recall" ->
      ("SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings " +
        "WHERE vec_id % 20 = 0 ORDER BY query_id"),

    "q_ivfsq_index_recall" ->
      ("SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings " +
        "WHERE vec_id % 20 = 0 ORDER BY query_id"),

    "q_ivfsq_delete" ->
      ("SELECT p.phase, vec_id AS query_id, TRUE AS recall_ok, " +
        "TRUE AS no_deleted FROM embeddings, " +
        "(VALUES ('served'), ('compacted')) AS p(phase) " +
        "WHERE vec_id % 20 = 0 ORDER BY phase, query_id"),

    "q_ivfpq_delete" ->
      ("SELECT p.phase, vec_id AS query_id, TRUE AS recall_ok, " +
        "TRUE AS no_deleted FROM embeddings, " +
        "(VALUES ('served'), ('compacted')) AS p(phase) " +
        "WHERE vec_id % 20 = 0 ORDER BY phase, query_id"),

    "q_ivfpq_filtered_recall" ->
      ("SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings " +
        "WHERE vec_id % 20 = 0 ORDER BY query_id"),

    "q_ivfsq_filtered_recall" ->
      ("SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings " +
        "WHERE vec_id % 20 = 0 ORDER BY query_id"),

    "q_ivf_index_recall" ->
      ("SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings " +
        "WHERE vec_id % 20 = 0 ORDER BY query_id"),

    "q_ivfsq_radius_recall" ->
      ("SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings " +
        "WHERE vec_id % 20 = 0 ORDER BY query_id"),

    "q_ivfpq_radius_recall" ->
      ("SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings " +
        "WHERE vec_id % 20 = 0 ORDER BY query_id"),

    // full probe: exact top-3 ids/ranks; cells_probed is the declared
    // budget (16 = nList), candidates_scanned the store's live rows
    "q_ann_explain" ->
      ("SELECT query_id, match_id, CAST(rnk AS INTEGER) AS rank, " +
        "CAST(16 AS INTEGER) AS cells_probed, " +
        "(SELECT count(*) FROM embeddings) AS candidates_scanned FROM (" +
        "SELECT q.vec_id AS query_id, c.vec_id AS match_id, " +
        "row_number() OVER (PARTITION BY q.vec_id " +
        "ORDER BY list_dot_product(q.embedding, c.embedding) DESC, c.vec_id) AS rnk " +
        "FROM embeddings q, embeddings c WHERE q.vec_id % 20 = 0) " +
        "WHERE rnk <= 3 ORDER BY query_id, rank"),

    "q_ivf_radius_recall" ->
      ("SELECT vec_id AS query_id, TRUE AS recall_ok FROM embeddings " +
        "WHERE vec_id % 20 = 0 ORDER BY query_id"),

    // exact char-5-shingle Jaccard over the minhash normalization
    // (lowercased alphanumeric tokens joined by one space) — the shared
    // ground-truth CTE the sketch contracts key on,
  )
}
