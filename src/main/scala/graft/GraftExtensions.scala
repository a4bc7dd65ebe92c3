package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal, Multiply, Pmod}
import org.apache.spark.sql.types.LongType

import graft.functions.{CosineSimilarityF32, DotProductF32, L2DistanceF32, TopKByScore}

/** Catalyst integration point: `spark.sql.extensions=graft.GraftExtensions`
  * (or `SparkSession.builder.withExtensions(new GraftExtensions)`) makes
  * the engine's expressions first-class SQL functions — usable from plain
  * `spark.sql(...)` text, resolved by the analyzer like built-ins and
  * participating fully in whole-stage codegen.
  *
  * This replaces the reference's implicit function surface (`ML_PREDICT`,
  * `FEDERATED_SEARCH` are Flink system functions, reference
  * README.md:280,405) with the idiomatic Spark extension mechanism.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    // the full (non-deprecated) constructor: only className/name/usage
    // matter for DESCRIBE FUNCTION; the rest are empty metadata slots
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - float32 dot product of two ARRAY<FLOAT> vectors"),
      (es: Seq[Expression]) => DotProductF32(es.head, es(1))))
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", "cosine_similarity(a, b) - float32 cosine similarity, clamped to [-1,1]"),
      (es: Seq[Expression]) => CosineSimilarityF32(es.head, es(1))))
    ext.injectFunction((
      FunctionIdentifier("l2_distance"),
      info("l2_distance", "l2_distance(a, b) - float32-accumulated euclidean distance"),
      (es: Seq[Expression]) => L2DistanceF32(es.head, es(1))))
    ext.injectFunction((
      FunctionIdentifier("top_k_by_score"),
      info("top_k_by_score",
        "top_k_by_score(id, score, k[, ascending]) - aggregate: best-k (id, score) pairs, ties by lower id"),
      (es: Seq[Expression]) => {
        val k = es(2).eval().asInstanceOf[Number].intValue()
        val asc = if (es.length > 3) es(3).eval().asInstanceOf[Boolean] else false
        TopKByScore(es.head, es(1), k, asc)
      }))
    // Deterministic sampling hash (Corpus.sampleHash) as a SQL function —
    // composed entirely from built-in expressions, so it codegens and
    // constant-folds like any built-in.
    ext.injectFunction((
      FunctionIdentifier("sample_hash"),
      info("sample_hash",
        "sample_hash(id) - overflow-free Knuth multiplicative hash of a BIGINT id into [0, 2^32)"),
      (es: Seq[Expression]) =>
        Pmod(
          Multiply(
            Pmod(Cast(es.head, LongType), Literal(2147483648L)),
            Literal(2654435761L)),
          Literal(4294967296L))))
  }
}
