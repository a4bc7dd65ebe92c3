package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import scala.collection.immutable.ListMap

import graft.functions.{HashEmbedder, TextOps, VectorFunctions}
import graft.operators.{Dedup, VectorSearch}
import graft.pipeline.Rag

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Determinism rules (FIXTURES.md §C): every query ends in an explicit
  * orderBy; float aggregates use exact integer-cent arithmetic; vector
  * scores use the float32 expressions that are bit-identical to DuckDB's
  * list functions, so raw doubles hash-match.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables(spark, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Rag.e2e(spark, "/root/testdata/sf0.001")

  /** Exact sum of a cents-valued double column: round to integer cents
    * (exact integral doubles — order-independent addition), divide back.
    */
  private def sumCents(c: org.apache.spark.sql.Column) =
    sum(round(c * 100)) / 100.0

  def queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(

    // --- P1/P2 scans & projections (SURVEY §2.2) -------------------------
    "q_scan_project" -> ((s, dir) =>
      t(s, dir, "documents")
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")),

    "q_filter" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_quantity") > 30 && col("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")),

    // --- schemaless -> schema retrofit (SURVEY §1.2) ---------------------
    "q_from_json" -> ((s, dir) =>
      t(s, dir, "events")
        .withColumn("k",
          from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))("k"))
        .select("event_id", "event_type", "k")
        .orderBy("event_id")),

    // --- aggregation breadth (SURVEY §2.4 / §7.5.9) ----------------------
    "q1_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sumCents(col("l_extendedprice")).as("sum_base_price"),
          (sum(round(col("l_extendedprice") * 100) *
            (lit(100) - round(col("l_discount") * 100))) / 10000.0).as("sum_revenue"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // --- dedup: exact (north star) ---------------------------------------
    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exact(t(s, dir, "documents"), "doc_id", "text")
        .select("doc_id", "n_chars")
        .orderBy("doc_id")),

    // --- embedding (J1/M1; no oracle — golden/property tests) ------------
    "q_embed" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), HashEmbedder.embedCol(col("text")).as("embedding"))
        .orderBy("doc_id")),

    // --- vector top-k, window strategy (J2) -------------------------------
    "q_vector_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      VectorSearch.topKFlat(queries, "query_id", "qv", emb, "vec_id", "embedding",
        k = 3, metric = "dot")
        .select("query_id", "match_id", "score", "rank")
        .orderBy("query_id", "rank")
    }),

    // --- vector top-k, bounded-heap aggregate strategy (scale path) ------
    "q_vector_topk_agg" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      VectorSearch.topKAgg(queries, "query_id", "qv", emb, "vec_id", "embedding",
        k = 3, metric = "dot")
        .select(col("query_id"), explode(col("matches")).as("m"))
        .select(col("query_id"), col("m.id").as("match_id"), col("m.score").as("score"))
        .orderBy(col("query_id"), col("score").desc, col("match_id"))
    }),

    // --- cosine knn over a query sample ----------------------------------
    "q_knn_cosine" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 10 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      VectorSearch.topKFlat(queries, "query_id", "qv", emb, "vec_id", "embedding",
        k = 5, metric = "cosine")
        .select("query_id", "match_id", "score", "rank")
        .orderBy("query_id", "rank")
    }),

    // --- embedding near-dup pairs (north star) ----------------------------
    "q_dedup_embedding" -> ((s, dir) =>
      Dedup.embeddingNearDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.8)
        .orderBy("id1", "id2")),

    // --- prompt assembly (F1/F2) ------------------------------------------
    "q_prompt_assembly" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          to_json(struct(lit("user").as("role"), col("text").as("content"),
            col("lang").as("lang"))).as("prompt"))
        .orderBy("doc_id")),

    // --- full RAG slice (no oracle; smoke + unit tests) -------------------
    "q_rag_e2e" -> ((s, dir) => Rag.e2e(s, dir)),
  )

  /** DuckDB-equivalent SQL per query (driver's t2 gate). Keys absent here
    * get a rows-only check.
    */
  def oracleSql: Map[String, String] = ListMap(
    "q_scan_project" ->
      "SELECT doc_id, source, n_chars FROM documents ORDER BY doc_id",

    "q_filter" ->
      ("SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem " +
        "WHERE l_quantity > 30 AND l_returnflag = 'R' " +
        "ORDER BY l_orderkey, l_linenumber"),

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
      ("SELECT query_id, match_id, score, CAST(rnk AS INTEGER) AS rank FROM (" +
        "SELECT q.vec_id AS query_id, c.vec_id AS match_id, " +
        "list_dot_product(q.embedding, c.embedding) AS score, " +
        "row_number() OVER (PARTITION BY q.vec_id " +
        "ORDER BY list_dot_product(q.embedding, c.embedding) DESC, c.vec_id) AS rnk " +
        "FROM embeddings q, embeddings c) WHERE rnk <= 3 " +
        "ORDER BY query_id, rank"),

    "q_vector_topk_agg" ->
      ("SELECT query_id, match_id, score FROM (" +
        "SELECT q.vec_id AS query_id, c.vec_id AS match_id, " +
        "list_dot_product(q.embedding, c.embedding) AS score, " +
        "row_number() OVER (PARTITION BY q.vec_id " +
        "ORDER BY list_dot_product(q.embedding, c.embedding) DESC, c.vec_id) AS rnk " +
        "FROM embeddings q, embeddings c) WHERE rnk <= 3 " +
        "ORDER BY query_id, score DESC, match_id"),

    "q_knn_cosine" ->
      ("SELECT query_id, match_id, score, CAST(rnk AS INTEGER) AS rank FROM (" +
        "SELECT q.vec_id AS query_id, c.vec_id AS match_id, " +
        "list_cosine_similarity(q.embedding, c.embedding) AS score, " +
        "row_number() OVER (PARTITION BY q.vec_id " +
        "ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id) AS rnk " +
        "FROM embeddings q, embeddings c WHERE q.vec_id % 10 = 0) WHERE rnk <= 5 " +
        "ORDER BY query_id, rank"),

    "q_dedup_embedding" ->
      ("SELECT a.vec_id AS id1, b.vec_id AS id2, " +
        "list_cosine_similarity(a.embedding, b.embedding) AS cosine " +
        "FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id " +
        "AND list_cosine_similarity(a.embedding, b.embedding) >= 0.8 " +
        "ORDER BY id1, id2"),

    "q_prompt_assembly" ->
      ("SELECT doc_id, json_object('role', 'user', 'content', text, 'lang', lang) AS prompt " +
        "FROM documents ORDER BY doc_id"),
  )
}
