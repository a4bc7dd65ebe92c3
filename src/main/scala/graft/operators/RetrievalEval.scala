package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation — precision@k, MRR, and nDCG@k
  * (Järvelin & Kekäläinen, TOIS 2002) of a ranking against a binary
  * relevance relation. The missing measurement half of the search
  * stack: the reference retrieves context by vector similarity
  * (README.md:355-366) and the recall contracts pin index quality
  * against exact search, but a production retrieval deployment is
  * graded against LABELED relevance — these are the standard metrics
  * it reports.
  *
  * Scale shape: metrics are one partial-agg pass over the ranked rows
  * (∝ queries × k, never corpus-sized); the per-label relevant-count
  * table is label-cardinality-sized and broadcasts; the ideal-DCG
  * lookup is a k-element literal array. No windows, no driver loops.
  *
  * Cross-engine float discipline: precision and MRR are exact integer
  * ratios (bit-stable); DCG sums ≤ k `1/log2(rank+1)` terms whose
  * engine divergence is libm-ulp sized — emitted values are
  * `round(x, 4)` under the measured-margin rule (RetrievalEvalSpec),
  * the [[Corpus.unigramXent]] discipline.
  */
object RetrievalEval {

  /** Evaluate `ranked` (qCol, idCol, rankCol; rank 1 best, ≤ k rows per
    * query) against the binary relevance relation `relevant`
    * (qCol, idCol). `nRelevant` (qCol -> total relevant items in the
    * CORPUS, not just retrieved) feeds the ideal DCG; queries absent
    * from it get nRel = 0 and a 0.0 nDCG.
    *
    * Output: (query_id, n_rel_at_k, prec_at_k, mrr, ndcg) — one row per
    * query present in `ranked`.
    */
  def evalRanking(ranked: DataFrame, qCol: String, idCol: String,
      rankCol: String, relevant: DataFrame, nRelevant: DataFrame,
      k: Int): DataFrame = {
    require(k > 0, s"evalRanking: k must be positive, got $k")
    // ideal DCG prefix sums: idcg(i) = sum_{j=1..i} 1/log2(j+1),
    // ascending-j summation (the oracle's ORDER BY cumsum makes the
    // same walk; term-level libm ulps are covered by the round margin)
    val idcg = new Array[Double](k + 1)
    (1 to k).foreach(i => idcg(i) = idcg(i - 1) + 1.0 / (math.log(i + 1.0) / math.log(2.0)))
    val idcgArr = array((0 to k).map(i => lit(idcg(i))): _*)

    val r = ranked.select(col(qCol).cast("long").as("query_id"),
      col(idCol).cast("long").as("match_id"), col(rankCol).cast("int").as("rank"))
    val rel = relevant.select(col(qCol).cast("long").as("query_id"),
      col(idCol).cast("long").as("match_id"), lit(true).as("__rel"))
    val hit = r.join(rel, Seq("query_id", "match_id"), "left")
      .withColumn("__hit", coalesce(col("__rel"), lit(false)))
    val perQuery = hit.groupBy("query_id").agg(
      sum(when(col("__hit"), 1L).otherwise(0L)).as("n_rel_at_k"),
      // MRR: 1/first-relevant-rank == max over relevant of 1/rank
      coalesce(max(when(col("__hit"), lit(1.0) / col("rank"))), lit(0.0)).as("__mrr"),
      coalesce(sum(when(col("__hit"),
        lit(1.0) / log2(col("rank") + 1))), lit(0.0)).as("__dcg"))
    val nRel = nRelevant.select(col(qCol).cast("long").as("query_id"),
      col(nRelevant.columns.last).cast("long").as("__n_rel"))
    perQuery
      .join(broadcast(nRel), Seq("query_id"), "left")
      .select(col("query_id"), col("n_rel_at_k"),
        round(col("n_rel_at_k").cast("double") / k, 4).as("prec_at_k"),
        // recall@k = retrieved relevant / total relevant (exact integer
        // ratio, the prec_at_k parity class); 0 when no relevance data
        round(when(coalesce(col("__n_rel"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("n_rel_at_k").cast("double") / col("__n_rel")), 4)
          .as("recall_at_k"),
        round(col("__mrr"), 4).as("mrr"),
        round(when(coalesce(col("__n_rel"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("__dcg") /
            element_at(idcgArr, least(lit(k), col("__n_rel")).cast("int") + 1)), 4)
          .as("ndcg"))
  }

  /** [[evalRanking]] with rounding switchable off — the UNROUNDED mrr /
    * dcg-derived values feed the rounding-margin assertion in
    * RetrievalEvalSpec.
    */
  private[graft] def evalRankingRaw(ranked: DataFrame, qCol: String,
      idCol: String, rankCol: String, relevant: DataFrame,
      nRelevant: DataFrame, k: Int): DataFrame = {
    val idcg = new Array[Double](k + 1)
    (1 to k).foreach(i => idcg(i) = idcg(i - 1) + 1.0 / (math.log(i + 1.0) / math.log(2.0)))
    val idcgArr = array((0 to k).map(i => lit(idcg(i))): _*)
    val r = ranked.select(col(qCol).cast("long").as("query_id"),
      col(idCol).cast("long").as("match_id"), col(rankCol).cast("int").as("rank"))
    val rel = relevant.select(col(qCol).cast("long").as("query_id"),
      col(idCol).cast("long").as("match_id"), lit(true).as("__rel"))
    val hit = r.join(rel, Seq("query_id", "match_id"), "left")
      .withColumn("__hit", coalesce(col("__rel"), lit(false)))
    val perQuery = hit.groupBy("query_id").agg(
      coalesce(max(when(col("__hit"), lit(1.0) / col("rank"))), lit(0.0)).as("mrr"),
      coalesce(sum(when(col("__hit"),
        lit(1.0) / log2(col("rank") + 1))), lit(0.0)).as("__dcg"))
    val nRel = nRelevant.select(col(qCol).cast("long").as("query_id"),
      col(nRelevant.columns.last).cast("long").as("__n_rel"))
    perQuery.join(broadcast(nRel), Seq("query_id"), "left")
      .select(col("query_id"), col("mrr"),
        when(coalesce(col("__n_rel"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("__dcg") /
            element_at(idcgArr, least(lit(k), col("__n_rel")).cast("int") + 1))
          .as("ndcg"))
  }

  /** Hard-negative mining (the contrastive-training data-prep step —
    * Karpukhin et al., EMNLP 2020 §4.2's "hard negatives": for each
    * query, the most SIMILAR items that are NOT relevant, here
    * label-disagreeing). One broadcast scan with the label filter
    * applied BEFORE the bounded per-query heap — same corpus-
    * broadcastable regime as [[VectorSearch.topKAgg]]; beyond it,
    * generate candidates with an ANN family first and anti-filter.
    * Output: (query_id, match_id, rank), rank 1 = hardest negative.
    */
  def hardNegatives(queries: DataFrame, qId: String, qVec: String,
      qLab: String, corpus: DataFrame, cId: String, cVec: String,
      cLab: String, k: Int, metric: String = "cosine"): DataFrame = {
    require(k > 0, s"hardNegatives: k must be positive, got $k")
    val c = broadcast(corpus.select(col(cId).cast("long").as("match_id"),
      col(cVec).as("__cvec"), col(cLab).as("__clab")))
    queries.select(col(qId).cast("long").as("query_id"),
        col(qVec).as("__qv"), col(qLab).as("__qlab"))
      .crossJoin(c)
      .filter(col("__clab") =!= col("__qlab"))
      .withColumn("__score",
        VectorSearch.scoreCol(metric)(col("__qv"), col("__cvec")))
      .groupBy("query_id")
      .agg(graft.functions.TopKByScore.topK(col("match_id"), col("__score"),
        k, metric == "l2").as("matches"))
      .select(col("query_id"), posexplode(col("matches")).as(Seq("__pos", "m")))
      .select(col("query_id"), col("m.id").as("match_id"),
        (col("__pos") + 1).cast("int").as("rank"))
  }

  /** Contrastive training triples (query, positive, negative) — the
    * composed data-prep step for embedding-model training (DPR-style,
    * Karpukhin 2020): positives are the query's top same-label
    * neighbors, negatives its [[hardNegatives]]; the i-th positive
    * pairs with the i-th negative (rank-aligned, so the hardest
    * negative trains against the closest positive). Self-pairs are
    * excluded from positives.
    *
    * Output: (query_id, pos_id, neg_id, pair_rank). Scale: two
    * broadcast scans with bounded heaps — rows ∝ queries × k.
    */
  def contrastiveTriples(queries: DataFrame, qId: String, qVec: String,
      qLab: String, corpus: DataFrame, cId: String, cVec: String,
      cLab: String, k: Int, metric: String = "cosine"): DataFrame = {
    require(k > 0, s"contrastiveTriples: k must be positive, got $k")
    val c = broadcast(corpus.select(col(cId).cast("long").as("match_id"),
      col(cVec).as("__cvec"), col(cLab).as("__clab")))
    val q = queries.select(col(qId).cast("long").as("query_id"),
      col(qVec).as("__qv"), col(qLab).as("__qlab"))
    val scored = q.crossJoin(c)
      .withColumn("__score",
        VectorSearch.scoreCol(metric)(col("__qv"), col("__cvec")))
    def ranked(filtered: DataFrame, outCol: String): DataFrame =
      filtered.groupBy("query_id")
        .agg(graft.functions.TopKByScore.topK(col("match_id"), col("__score"),
          k, metric == "l2").as("matches"))
        .select(col("query_id"), posexplode(col("matches")).as(Seq("__pos", "m")))
        .select(col("query_id"), col("m.id").as(outCol),
          (col("__pos") + 1).cast("int").as("pair_rank"))
    val pos = ranked(scored.filter(col("__clab") === col("__qlab") &&
      col("match_id") =!= col("query_id")), "pos_id")
    val neg = ranked(scored.filter(col("__clab") =!= col("__qlab")), "neg_id")
    pos.join(neg, Seq("query_id", "pair_rank"))
      .select("query_id", "pos_id", "neg_id", "pair_rank")
  }

  /** Label-relevance evaluation of exact cosine top-k retrieval over an
    * embedded corpus: queries are corpus members, an item is relevant
    * to a query iff it carries the query's label (the standard
    * clustered-corpus protocol). Composes [[VectorSearch.topKAgg]] with
    * [[evalRanking]].
    */
  def evalLabelRetrieval(queries: DataFrame, qId: String, qVec: String,
      qLabel: String, corpus: DataFrame, cId: String, cVec: String,
      cLabel: String, k: Int, metric: String = "cosine"): DataFrame = {
    val ranked = VectorSearch.topKAgg(queries, qId, qVec, corpus, cId, cVec,
        k, metric)
      .select(col(qId).as("query_id"),
        posexplode(col("matches")).as(Seq("__pos", "m")))
      .select(col("query_id"), col("m.id").as("match_id"),
        (col("__pos") + 1).cast("int").as("rank"))
    val labels = corpus.select(col(cId).cast("long").as("match_id"),
      col(cLabel).as("__lab"))
    val qLabels = queries.select(col(qId).cast("long").as("query_id"),
      col(qLabel).as("__qlab"))
    val relevant = qLabels.join(labels, col("__qlab") === col("__lab"))
      .select("query_id", "match_id")
    val labelCounts = corpus.groupBy(col(cLabel).as("__lab"))
      .agg(count(lit(1)).as("__cnt"))
    val nRel = qLabels.join(broadcast(labelCounts),
        col("__qlab") === col("__lab"))
      .select(col("query_id"), col("__cnt"))
    evalRanking(ranked, "query_id", "match_id", "rank", relevant, nRel, k)
  }
}
