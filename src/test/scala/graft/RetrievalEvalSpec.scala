package graft

import org.apache.spark.sql.functions._

import graft.operators.RetrievalEval

class RetrievalEvalSpec extends SparkSpec {
  import spark.implicits._

  test("metrics match hand computation on a fixed ranking") {
    // query 0: ranks 1,2,3 with relevance T,F,T; corpus holds 3 relevant
    val ranked = Seq((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3))
      .toDF("q", "id", "rank")
    val rel = Seq((0L, 10L), (0L, 12L), (0L, 99L)).toDF("q", "id")
    val nRel = Seq((0L, 3L)).toDF("q", "cnt")
    val got = RetrievalEval.evalRanking(ranked, "q", "id", "rank",
      rel, nRel, k = 3)
      .as[(Long, Long, Double, Double, Double, Double)].collect().head
    val (qid, nRelAtK, prec, recall, mrr, ndcg) = got
    assert(qid == 0L && nRelAtK == 2L)
    assert(prec == math.rint(2.0 / 3 * 1e4) / 1e4)
    assert(recall == math.rint(2.0 / 3 * 1e4) / 1e4) // 2 of 3 relevant found
    assert(mrr == 1.0)
    def l2i(i: Int) = 1.0 / (math.log(i + 1.0) / math.log(2.0))
    val dcg = l2i(1) + l2i(3)
    val idcg = l2i(1) + l2i(2) + l2i(3) // min(k=3, nRel=3) terms
    assert(math.abs(ndcg - math.rint(dcg / idcg * 1e4) / 1e4) <= 1e-4)
  }

  test("no relevant retrieved -> mrr 0, ndcg 0; missing nRel -> ndcg 0") {
    val ranked = Seq((0L, 10L, 1), (1L, 20L, 1)).toDF("q", "id", "rank")
    val rel = Seq((0L, 99L)).toDF("q", "id") // nothing retrieved is relevant
    val nRel = Seq((0L, 1L)).toDF("q", "cnt") // query 1 absent
    val got = RetrievalEval.evalRanking(ranked, "q", "id", "rank",
        rel, nRel, k = 5)
      .as[(Long, Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(0L)._5 == 0.0 && got(0L)._6 == 0.0)
    assert(got(0L)._4 == 0.0, "nothing retrieved relevant must score recall 0")
    assert(got(1L)._6 == 0.0, "query with no relevance data must score ndcg 0")
    assert(got(1L)._4 == 0.0, "query with no relevance data must score recall 0")
  }

  test("perfect ranking of all relevant items scores ndcg 1") {
    val ranked = Seq((0L, 1L, 1), (0L, 2L, 2)).toDF("q", "id", "rank")
    val rel = Seq((0L, 1L), (0L, 2L)).toDF("q", "id")
    val nRel = Seq((0L, 2L)).toDF("q", "cnt")
    val got = RetrievalEval.evalRanking(ranked, "q", "id", "rank",
      rel, nRel, k = 2)
      .as[(Long, Long, Double, Double, Double, Double)].collect().head
    assert(got._6 == 1.0)
    assert(got._3 == 1.0 && got._4 == 1.0 && got._5 == 1.0)
  }

  test("label retrieval on the sf corpus: self-match makes mrr 1 everywhere") {
    val emb = Tables(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("label").as("qlab"))
    val got = RetrievalEval.evalLabelRetrieval(q, "query_id", "qv", "qlab",
        emb, "vec_id", "embedding", "label", k = 10)
      .as[(Long, Long, Double, Double, Double, Double)].collect()
    assert(got.nonEmpty)
    // every query is its own rank-1 retrieval and shares its own label
    assert(got.forall(_._5 == 1.0), "self-match must pin MRR to 1")
    assert(got.forall(r => r._6 > 0.0 && r._6 <= 1.0))
    assert(got.forall(r => r._4 > 0.0 && r._4 <= 1.0), "recall in (0,1]")
    assert(got.forall(r => r._2 >= 1L && r._2 <= 10L))
  }

  test("hard negatives: never the query's label, ranked by similarity") {
    val emb = Tables(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("label").as("qlab"))
    val got = RetrievalEval.hardNegatives(q, "query_id", "qv", "qlab",
        emb, "vec_id", "embedding", "label", k = 5)
      .as[(Long, Long, Int)].collect()
    assert(got.nonEmpty)
    val labels = emb.select(col("vec_id"), col("label"))
      .as[(Long, Int)].collect().toMap
    got.foreach { case (qid, mid, _) =>
      assert(labels(mid) != labels(qid),
        s"negative $mid shares query $qid's label")
    }
    // brute-force check: rank 1 is the max-cosine other-label item
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Float = {
      var d = 0.0f; var aa = 0.0f; var bb = 0.0f
      a.indices.foreach { i => d += a(i)*b(i); aa += a(i)*a(i); bb += b(i)*b(i) }
      d / (math.sqrt(aa).toFloat * math.sqrt(bb).toFloat)
    }
    got.filter(_._3 == 1).foreach { case (qid, mid, _) =>
      val best = vecs.keys.filter(c => labels(c) != labels(qid))
        .maxBy(c => (cos(vecs(qid), vecs(c)), -c))
      assert(mid == best, s"query $qid: hardest negative $mid != $best")
    }
  }

  test("contrastive triples: labels agree/disagree correctly, no self positives") {
    val emb = Tables(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("label").as("qlab"))
    val got = RetrievalEval.contrastiveTriples(q, "query_id", "qv", "qlab",
        emb, "vec_id", "embedding", "label", k = 3)
      .as[(Long, Long, Long, Int)].collect()
    assert(got.nonEmpty)
    val labels = emb.select(col("vec_id"), col("label"))
      .as[(Long, Int)].collect().toMap
    got.foreach { case (qid, pos, neg, r) =>
      assert(pos != qid, s"self positive for $qid")
      assert(labels(pos) == labels(qid), s"positive $pos label mismatch")
      assert(labels(neg) != labels(qid), s"negative $neg label match")
      assert(r >= 1 && r <= 3)
    }
    // rank-aligned: each query has equal pos/neg counts (the join)
    got.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.length).toSeq,
        s"query $qid ranks not contiguous")
    }
  }

  test("rounding margins: no metric on the gate corpus sits near a 1e-4 boundary") {
    // prec/mrr are exact integer ratios; dcg-derived values carry libm
    // ulps — same measured-margin rule as CorpusSpec/LexicalSpec.
    def boundaryDist(v: Double): Double = {
      val scaled = v * 1e4
      math.abs(scaled - math.floor(scaled) - 0.5) * 1e-4
    }
    val gateDir = "/root/testdata/sf0.01"
    assume(new java.io.File(gateDir).isDirectory)
    val emb = Tables(spark, gateDir, "embeddings")
    val q = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("label").as("qlab"))
    val ranked = graft.operators.VectorSearch.topKAgg(q, "query_id", "qv",
        emb, "vec_id", "embedding", 10, "cosine")
      .select(col("query_id"), posexplode(col("matches")).as(Seq("__pos", "m")))
      .select(col("query_id"), col("m.id").as("match_id"),
        (col("__pos") + 1).cast("int").as("rank"))
    val labels = emb.select(col("vec_id").as("match_id"), col("label").as("__lab"))
    val rel = q.select(col("query_id"), col("qlab"))
      .join(labels, col("qlab") === col("__lab")).select("query_id", "match_id")
    val nRel = q.join(emb.groupBy("label").agg(count(lit(1)).as("cnt")),
        col("qlab") === col("label")).select(col("query_id"), col("cnt"))
    val m = RetrievalEval.evalRankingRaw(ranked, "query_id", "match_id",
        "rank", rel, nRel, k = 10)
      .select(explode(array(col("mrr"), col("ndcg")))).as[Double]
      .collect().map(boundaryDist).min
    assert(m >= 1e-9,
      f"retrieval metric within $m%.2e of a 1e-4 rounding boundary — " +
        "re-measure margins before the hash gate flips")
  }
}
