package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.VectorSearch
import graft.pipeline.Rag

/** Scratch profiling main (not part of the driver contract). */
object ProfMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    def noop(df: DataFrame): Long = { df.write.format("noop").mode("overwrite").save(); 0L }
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val questions = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text").as("content"))
    val corpus = Tables(spark, dir, "embeddings")
    val withVec = Rag.embedQuestions(questions, "content")
    val slim = withVec.select(col("doc_id"), col("vector"))
    // warmup (JIT + codegen + parquet footer caches)
    time("warmup (embed count)")(withVec.count())
    time("topKAgg full")(
      noop(VectorSearch.topKAgg(slim, "doc_id", "vector", corpus, "vec_id", "embedding", 3)))
    time("topKAgg full (warm)")(
      noop(VectorSearch.topKAgg(slim, "doc_id", "vector", corpus, "vec_id", "embedding", 3)))
    time("topKBroadcast full")(
      noop(VectorSearch.topKBroadcast(slim, "doc_id", "vector", corpus, "vec_id", "embedding", 3)))
    time("topKBroadcast full (warm)")(
      noop(VectorSearch.topKBroadcast(slim, "doc_id", "vector", corpus, "vec_id", "embedding", 3)))
    time("full e2e")(noop(Rag.e2e(spark, dir)))
    if (args.length > 1) {
      VectorSearch.topKAgg(slim, "doc_id", "vector", corpus, "vec_id", "embedding", 3)
        .explain("formatted")
    }
    spark.stop()
  }
}
