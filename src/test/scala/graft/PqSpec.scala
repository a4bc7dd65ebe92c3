package graft

import org.apache.spark.sql.functions._
import graft.operators.{PqSearch, VectorSearch}

class PqSpec extends SparkSpec {

  private lazy val emb = Tables(spark, sf, "embeddings")
  private lazy val queries = emb.filter(col("vec_id") % 10 === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qv"))

  test("pq returns k matches per query, self-match first") {
    val got = PqSearch.pqTopK(queries, "qid", "qv", emb, "vec_id", "embedding",
      k = 3, metric = "dot", m = 8, kCodes = 16, numCandidates = 100)
      .collect()
    val byQuery = got.groupBy(_.getLong(0))
    assert(byQuery.nonEmpty)
    byQuery.foreach { case (q, rows) =>
      assert(rows.length == 3, s"query $q should have 3 matches")
      // the query's own vector shares every code with itself, so it tops
      // the ADC scan and the exact re-rank confirms it at rank 1
      val rank1 = rows.minBy(_.getInt(3))
      assert(rank1.getLong(1) == q, s"query $q rank1=${rank1.getLong(1)}")
    }
  }

  test("pq recall vs exact top-k is reasonable at numCandidates=100") {
    val exact = VectorSearch.topKFlat(queries, "qid", "qv", emb, "vec_id", "embedding",
      k = 3, metric = "dot")
      .select("qid", "match_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = PqSearch.pqTopK(queries, "qid", "qv", emb, "vec_id", "embedding",
      k = 3, metric = "dot", m = 8, kCodes = 16, numCandidates = 100)
      .select("qid", "match_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low")
  }

  test("codebook training is deterministic across runs and partitionings") {
    val a = PqSearch.trainCodebooks(emb, "vec_id", "embedding", m = 4, kCodes = 8)
    val b = PqSearch.trainCodebooks(emb.repartition(7), "vec_id", "embedding",
      m = 4, kCodes = 8)
    assert(a.m == 4 && a.kCodes == 8 && a.dsub == 16)
    for (s <- 0 until a.m; c <- 0 until a.kCodes)
      assert(a.books(s)(c).sameElements(b.books(s)(c)), s"book($s)($c) differs")
  }

  test("encode emits m codes in [0, kCodes) and is stable") {
    val cb = PqSearch.trainCodebooks(emb, "vec_id", "embedding", m = 8, kCodes = 16)
    val coded = PqSearch.encode(emb, "vec_id", "embedding", cb)
    val rows = coded.collect()
    assert(rows.length == emb.count())
    rows.foreach { r =>
      val codes = r.getSeq[Int](1)
      assert(codes.length == 8)
      assert(codes.forall(c => c >= 0 && c < 16))
    }
    val again = PqSearch.encode(emb, "vec_id", "embedding", cb).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("widening the candidate budget never lowers recall") {
    val exact = VectorSearch.topKFlat(queries, "qid", "qv", emb, "vec_id", "embedding",
      k = 3, metric = "dot")
      .select("qid", "match_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def hits(cand: Int) =
      PqSearch.pqTopK(queries, "qid", "qv", emb, "vec_id", "embedding",
        k = 3, metric = "dot", m = 8, kCodes = 16, numCandidates = cand)
        .select("qid", "match_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val narrow = exact.intersect(hits(10)).size
    val wide = exact.intersect(hits(500)).size
    assert(wide >= narrow, s"recall shrank: cand=10 -> $narrow, cand=500 -> $wide")
  }

  test("budget and batch bounds are enforced") {
    intercept[IllegalArgumentException](
      PqSearch.pqTopK(queries, "qid", "qv", emb, "vec_id", "embedding",
        k = 3, numCandidates = 10001))
    intercept[IllegalArgumentException](
      PqSearch.pqTopK(queries, "qid", "qv", emb, "vec_id", "embedding",
        k = 30, numCandidates = 10))
    intercept[IllegalArgumentException](
      PqSearch.pqTopK(queries, "qid", "qv", emb, "vec_id", "embedding",
        k = 3, numCandidates = 100, maxQueries = 1))
  }
}
