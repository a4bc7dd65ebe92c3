package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.HashEmbedder
import graft.model.Models
import graft.operators.VectorSearch

/** The reference's end-to-end pipeline (SURVEY §3, reference
  * README.md:17-24), re-expressed as three narrow Spark stages over the
  * test tables:
  *
  *   1. embed   — question text -> vector
  *      (`ml_predict('vector_encoding', content)`, README.md:286-288)
  *   2. search  — vector -> top-k corpus matches as `products`
  *      (`FEDERATED_SEARCH('mongodb_vector_search', 3, vector)`,
  *       README.md:438-446)
  *   3. respond — prompt JSON -> assistant answer
  *      (`json_object(...)` + `ML_PREDICT('retail_assistant', ...)`,
  *       README.md:724-732)
  *
  * `documents` stands in for `user_questions`; `embeddings` for the
  * Atlas `retail.product` vector corpus. Stages 1 and 3 are shuffle-free
  * projections; stage 2 is a broadcast scoring join + per-query top-k.
  */
object Rag {
  val K = 3 // reference k (README.md:406)

  /** Stage 1: user_questions -> user_questions_vector. */
  def embedQuestions(questions: DataFrame, textCol: String): DataFrame = {
    val registry = Models.default()
    questions.withColumn("vector",
      registry.mlPredict(Models.VectorEncoding, col(textCol)))
  }

  /** Stage 2: append `products ARRAY<STRUCT<content>>` — the reference's
    * `search_results AS products` (README.md:430). Corpus vectors come
    * from the embeddings table; `content` is synthesized from the match
    * id like the reference's product descriptions.
    */
  def retrieve(withVec: DataFrame, qId: String, corpus: DataFrame, k: Int = K): DataFrame = {
    val corpusWithContent = corpus.withColumn(
      "content", concat(lit("product_"), col("vec_id"), lit(" label_"), col("label")))
    VectorSearch.searchResults(
      withVec, qId, "vector", corpusWithContent, "vec_id", "embedding",
      payload = Seq("content"), k = k)
      .withColumnRenamed("search_results", "products")
  }

  /** Stage 3: prompt assembly (to_json = Flink JSON_OBJECT, compact,
    * key order = argument order) + deterministic LLM.
    */
  def respond(withProducts: DataFrame, contentCol: String): DataFrame = {
    val registry = Models.default()
    withProducts
      .withColumn("prompt", to_json(struct(
        lit("user").as("role"),
        col(contentCol).as("content"),
        to_json(col("products")).as("products"))))
      .withColumn("json_response",
        registry.mlPredict(Models.RetailAssistant, col("prompt")))
  }

  /** Hybrid-retrieval RAG: the [[e2e]] slice with stage 2 swapped for
    * [[graft.operators.Lexical.hybridTopK]] — reciprocal-rank fusion of
    * the vector ranking with a BM25 ranking of the question's tokens,
    * retrieving from the DOCUMENTS corpus itself (the self-retrieval
    * deployment: "find related documents", both vectors from the
    * registry embedder). Questions subsample (doc_id % 20) keeps the
    * lexical side's term fan-out bounded in the bench.
    */
  /** The embedded documents corpus for [[hybridE2e]] — split out so the
    * caller can memoize it: corpus embeddings are an OFFLINE indexing
    * artifact in the reference (stored in the vector topic,
    * README.md:432-445), so queries should not re-embed per run.
    */
  def hybridCorpus(spark: SparkSession, dir: String): DataFrame = {
    val registry = Models.default()
    Tables(spark, dir, "documents")
      .select(col("doc_id").as("cid"), col("text").as("ctext"))
      .withColumn("cvec", registry.mlPredict(Models.VectorEncoding, col("ctext")))
  }

  def hybridE2e(spark: SparkSession, dir: String, k: Int = K,
      corpusOverride: DataFrame = null, dfOverride: DataFrame = null,
      postOverride: DataFrame = null,
      statsOverride: DataFrame = null): DataFrame = {
    val corpus =
      if (corpusOverride != null) corpusOverride
      else hybridCorpus(spark, dir)
    val questions = Tables(spark, dir, "documents")
      .filter(col("doc_id") % 20 === 0)
      .select(col("doc_id"), col("text").as("content"))
    val withVec = embedQuestions(questions, "content")
    // maxQueryTerms = 8: a document-as-query over this corpus's small
    // vocabulary would otherwise match every corpus token on the
    // lexical side — rarest-first term selection is the standard
    // long-query treatment (see Lexical.hybridTopK)
    val fused = graft.operators.Lexical.hybridTopK(
      withVec, "doc_id", "vector", "content",
      corpus, "cid", "cvec", "ctext", k, metric = "dot", maxQueryTerms = 8,
      dfTable = dfOverride, post = postOverride, stats = statsOverride)
    val products = fused
      .join(corpus.select(col("cid").cast("long").as("match_id"), col("ctext")),
        "match_id")
      .groupBy("query_id")
      .agg(sort_array(collect_list(struct(col("rrf_rank"), col("ctext"))))
        .as("__sorted"))
      .select(col("query_id").as("doc_id"),
        transform(col("__sorted"), x =>
          struct(x.getField("ctext").as("content"))).as("products"))
    respond(questions.join(products, "doc_id"), "content")
      .select("doc_id", "content", "products", "prompt", "json_response")
      .orderBy("doc_id")
  }

  /** Full slice over a testdata dir (SURVEY §7.3): flagship entry. */
  def e2e(spark: SparkSession, dir: String, k: Int = K): DataFrame = {
    val questions = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text").as("content"))
    val corpus = Tables(spark, dir, "embeddings")
    val withVec = embedQuestions(questions, "content")
    val retrieved = retrieve(withVec, "doc_id", corpus, k)
    respond(retrieved, "content")
      .select("doc_id", "content", "products", "prompt", "json_response")
      .orderBy("doc_id")
  }
}
