package graft

import org.apache.spark.sql.functions._
import graft.operators.{BqSearch, VectorSearch}

class BqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables(spark, sf, "embeddings")
  private lazy val queries = emb.filter(col("vec_id") % 10 === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qv"))

  test("bq returns k matches per query, self-match first") {
    val model = BqSearch.trainModel(emb, "embedding", dim = 64)
    val got = BqSearch.bqTopK(queries, "qid", "qv", emb, "vec_id", "embedding",
      k = 3, model = model, metric = "dot", numCandidates = 100)
      .collect()
    val byQuery = got.groupBy(_.getLong(0))
    assert(byQuery.nonEmpty)
    byQuery.foreach { case (q, rows) =>
      assert(rows.length == 3, s"query $q should have 3 matches")
      // a vector's own code is hamming-0 from itself, so the self-match
      // always survives the candidate cut and exact re-rank tops it
      val rank1 = rows.minBy(_.getInt(3))
      assert(rank1.getLong(1) == q, s"query $q rank1=${rank1.getLong(1)}")
    }
  }

  test("bq candidate recall vs exact top-k (1-bit codes, 100 candidates)") {
    val model = BqSearch.trainModel(emb, "embedding", dim = 64)
    val exact = VectorSearch.topKFlat(queries, "qid", "qv", emb, "vec_id",
        "embedding", k = 3, metric = "dot")
      .select("qid", "match_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = BqSearch.bqTopK(queries, "qid", "qv", emb, "vec_id", "embedding",
        k = 3, model = model, metric = "dot", numCandidates = 100)
      .select("qid", "match_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    // 1 bit per dim is the coarsest family member: recall trails SQ8's
    // but the 100-candidate cut over this corpus must still find most
    // of the exact top-3
    assert(recall >= 0.6, s"recall $recall too low for BQ at numCandidates=100")
  }

  test("training is deterministic across partitionings (midrange, not mean)") {
    val a = BqSearch.trainModel(emb, "embedding", dim = 64)
    val b = BqSearch.trainModel(emb.repartition(7), "embedding", dim = 64)
    assert(a.thr.toSeq == b.thr.toSeq,
      "midrange thresholds must not depend on partitioning")
  }

  test("encodeVec packs sign bits; hamming of a flipped dim is exactly 1") {
    val m = BqSearch.BqModel(Array.fill(64)(0f))
    val v = Array.fill(64)(1f)
    val c1 = BqSearch.encodeVec(m, v)
    assert(c1.length == 1 && c1(0) == -1L, "all 64 bits set == -1L")
    v(17) = -1f
    val c2 = BqSearch.encodeVec(m, v)
    assert(java.lang.Long.bitCount(c1(0) ^ c2(0)) == 1)
    // boundary rule: exactly-at-threshold encodes as 0 (strict >)
    assert(BqSearch.encodeVec(m, Array.fill(64)(0f))(0) == 0L)
  }

  test("dim > 64 packs into multiple words and still searches") {
    val dim = 96
    val vecs = (0L until 40L).map { i =>
      i -> Array.tabulate(dim)(d => math.sin(i * 31 + d * 7).toFloat)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val m = BqSearch.trainModel(df, "embedding", dim)
    assert(m.words == 2)
    val q = df.filter(col("vec_id") === 5L)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val got = BqSearch.bqTopK(q, "qid", "qv", df, "vec_id", "embedding",
      k = 2, model = m, metric = "dot", numCandidates = 10)
      .collect()
    assert(got.length == 2)
    assert(got.minBy(_.getInt(3)).getLong(1) == 5L, "self-match first")
  }

  test("save/load round-trips; cachedModel trains once per tag") {
    val tmp = java.nio.file.Files.createTempDirectory("bq_model_").toString
    val m = BqSearch.trainModel(emb, "embedding", dim = 64)
    BqSearch.saveModel(spark, s"$tmp/m", m)
    val loaded = BqSearch.loadModel(spark, s"$tmp/m")
    assert(loaded.thr.toSeq == m.thr.toSeq)
    val before = BqSearch.trainInvocations.get()
    val tag = s"bqspec_${System.nanoTime()}"
    BqSearch.cachedModel(emb, "embedding", tag, persist = false)
    BqSearch.cachedModel(emb, "embedding", tag, persist = false)
    assert(BqSearch.trainInvocations.get() == before + 1,
      "second cachedModel call must not retrain")
  }
}
