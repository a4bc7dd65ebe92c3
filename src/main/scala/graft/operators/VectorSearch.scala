package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TopKByScore, TopKHeap, VectorFunctions}

/** In-engine top-k vector similarity search — the Spark-native equivalent
  * of the reference's `FEDERATED_SEARCH('mongodb_vector_search', k, vector)`
  * lateral join against MongoDB Atlas `$vectorSearch`
  * (reference README.md:355-366, 404-407, 438-446; parameters: similarity
  * dotProduct README.md:380, k=3 README.md:406, numCandidates≤10000
  * README.md:364,368).
  *
  * Physical shape: the corpus is the broadcast side of a nested-loop
  * scoring join (corpora that fit the broadcast threshold), scored with the
  * codegen'd float32 expressions in [[graft.functions.VectorExprs]]. Two
  * top-k strategies:
  *
  *  - `topKFlat` — window `row_number() <= k`. Shuffles the full
  *    |Q|x|C| scored relation on query id: correct, oracle-friendly, but
  *    NOT the 100 TB path.
  *  - `topKAgg` — the native bounded-heap [[graft.functions.TopKByScore]]
  *    aggregate. Partial aggregation runs map-side inside the same stage
  *    as the scoring join, so only ≤k rows per query per partition ever
  *    reach the shuffle. This is the plan that survives a 1000-executor
  *    corpus scan.
  *  - `topKBroadcast` — collect+broadcast the corpus, compute each
  *    query's top-k in one narrow projection: zero shuffle, no
  *    intermediate cross product. The fastest exact path while the
  *    corpus fits executor memory.
  *
  * For corpora too big to broadcast, `annTopK` prunes candidates with
  * sign-random-projection LSH buckets first (the `numCandidates`
  * recall/latency knob, README.md:364,368): an equi-join on bucket id
  * replaces the cross product, at a documented recall cost.
  */
object VectorSearch {

  /** Score metric by name, mirroring Atlas index `similarity` options. */
  def scoreCol(metric: String)(q: Column, c: Column): Column = metric match {
    case "dot"    => VectorFunctions.dot_product(q, c)
    case "cosine" => VectorFunctions.cosine_similarity(q, c)
    case "l2"     => VectorFunctions.l2_distance(q, c) // smaller = closer
    case m        => throw new IllegalArgumentException(s"unknown metric $m")
  }

  private def orderFor(metric: String): Seq[Column] =
    if (metric == "l2") Seq(col("score").asc, col("match_id").asc)
    else Seq(col("score").desc, col("match_id").asc)

  /** Grouped MaxSim retrieval — the multi-vector late-interaction shape
    * (ColBERT's MaxSim reduced to document granularity, Khattab &
    * Zaharia, SIGIR 2020): a DOCUMENT is represented by MANY vectors
    * (its chunks — the [[graft.operators.Corpus.chunkTokens]] → embed
    * pipeline's at-rest layout), and a document's score for a query is
    * the MAX similarity over its member vectors. Output: (qId,
    * match_group, rank), rank 1 best, ties by smaller group key.
    *
    * Scale shape: one broadcast scoring scan (the [[topKAgg]] regime),
    * then `max` partial-aggregated per (query, group) — skew-safe — and
    * the bounded per-query heap. Never a window over a content key.
    *
    * The broadcast is byte-guarded (the [[topKBroadcast]] stats check):
    * a multi-vector corpus carries MANY vectors per document, so it
    * outgrows the broadcast limit faster than any single-vector path.
    * Beyond `maxCorpusBytes`, scoring falls back to a replicated-block
    * shuffle equi-join — queries replicate across `shuffle.partitions`
    * block ids, corpus rows hash to one block each — which realizes the
    * same |Q|×|C| scoring scan as a distributed, AQE-splittable join
    * feeding the identical partial-max/heap aggregation.
    * [[groupMaxSimAnn]] remains the preferred route at that scale.
    */
  def groupMaxSimTopK(
      queries: DataFrame, qId: String, qVec: String,
      corpus: DataFrame, cGroup: String, cVec: String,
      k: Int, metric: String = "cosine",
      maxCorpusBytes: Long = 1L << 30): DataFrame = {
    require(k > 0, s"groupMaxSimTopK: k must be positive, got $k")
    val asc = metric == "l2"
    val cSlim = corpus.select(col(cGroup).cast("long").as("__grp"),
      col(cVec).as("__cvec"))
    val q = queries.select(col(qId).cast("long").as("query_id"),
      col(qVec).as("__qv"))
    val scored =
      if (corpus.queryExecution.optimizedPlan.stats.sizeInBytes <=
          BigInt(maxCorpusBytes))
        q.crossJoin(broadcast(cSlim))
      else {
        val nBlocks = queries.sparkSession.sessionState.conf.numShufflePartitions
        // row-hash block key (vector included): even spread regardless of
        // group-size skew; every query meets every corpus row exactly once
        val cB = cSlim.withColumn("__blk",
          pmod(xxhash64(col("__grp"), col("__cvec")), lit(nBlocks)).cast("int"))
        val qB = q.withColumn("__blk",
          explode(sequence(lit(0), lit(nBlocks - 1))))
        qB.join(cB, "__blk").drop("__blk")
      }
    scored
      .withColumn("__s", scoreCol(metric)(col("__qv"), col("__cvec")))
      .groupBy("query_id", "__grp")
      // l2: a document is as close as its CLOSEST member -> min
      .agg((if (asc) min(col("__s")) else max(col("__s"))).as("__best"))
      .groupBy("query_id")
      .agg(graft.functions.TopKByScore.topK(col("__grp"), col("__best"), k, asc)
        .as("matches"))
      .select(col("query_id"), posexplode(col("matches")).as(Seq("__pos", "m")))
      .select(col("query_id"), col("m.id").as("match_group"),
        (col("__pos") + 1).cast("int").as("rank"))
  }

  /** [[groupMaxSimTopK]]'s scale path: IVF-probed chunk candidates
    * (`numCandidates` best member vectors per query), then the group
    * max over the RETRIEVED members only — the standard multi-vector
    * ANN approximation (a group whose every member is missed by the
    * probe cannot rank; recall is governed by the candidate budget, the
    * same knob as every ANN family here, and gated by the recall
    * contract like the rest). The candidate set is queries ×
    * numCandidates ids — broadcast back onto a slim (id, group)
    * projection, so the corpus is scanned only by the probe.
    */
  def groupMaxSimAnn(
      queries: DataFrame, qId: String, qVec: String,
      corpus: DataFrame, cGroup: String, cId: String, cVec: String,
      k: Int, metric: String = "cosine",
      numCandidates: Int = 1000): DataFrame = {
    require(k > 0, s"groupMaxSimAnn: k must be positive, got $k")
    val asc = metric == "l2"
    val cand = IvfSearch.ivfTopKCandidates(queries, qId, qVec,
        corpus, cId, cVec, k = numCandidates, metric = metric,
        numCandidates = numCandidates)
      .select(col(qId).cast("long").as("query_id"),
        col("match_id"), col("score"))
    val groups = corpus.select(col(cId).cast("long").as("match_id"),
      col(cGroup).cast("long").as("__grp"))
    groups.join(broadcast(cand), "match_id")
      .groupBy("query_id", "__grp")
      .agg((if (asc) min(col("score")) else max(col("score"))).as("__best"))
      .groupBy("query_id")
      .agg(graft.functions.TopKByScore.topK(col("__grp"), col("__best"), k, asc)
        .as("matches"))
      .select(col("query_id"), posexplode(col("matches")).as(Seq("__pos", "m")))
      .select(col("query_id"), col("m.id").as("match_group"),
        (col("__pos") + 1).cast("int").as("rank"))
  }

  /** [[groupMaxSimAnn]] served from a PERSISTED IVF index
    * ([[IvfSearch.writeIndex]] over the member vectors): candidates
    * come from the partition-pruned probe — only the probed cells'
    * directories are ever listed — and the group max runs over the
    * retrieved members only. `groups` is the slim member→group mapping
    * (matchIdCol, groupCol), an offline artifact next to the index the
    * way `termDf` sits next to the posting store (16 bytes per member;
    * corpora whose member ids ENCODE the group — the chunk_uid
    * convention of `Streams.chunkIndexStream` — can derive it as a pure
    * projection instead of storing it). The corpus itself is touched
    * only by the probe, so a continuously-appended index serves
    * multi-vector retrieval with no batch rebuild.
    */
  def groupMaxSimIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, qId: String, qVec: String,
      groups: DataFrame, matchIdCol: String, groupCol: String,
      k: Int, metric: String = "cosine",
      numCandidates: Int = 1000, nProbe: Int = 4): DataFrame = {
    require(k > 0, s"groupMaxSimIndex: k must be positive, got $k")
    val asc = metric == "l2"
    val cand = IvfSearch.searchIndex(spark, path, queries, qId, qVec,
        k = numCandidates, metric = metric, nProbe = nProbe)
      .select(col(qId).cast("long").as("query_id"),
        col("match_id"), col("score"))
    val g = groups.select(col(matchIdCol).cast("long").as("match_id"),
      col(groupCol).cast("long").as("__grp"))
    g.join(broadcast(cand), "match_id")
      .groupBy("query_id", "__grp")
      .agg((if (asc) min(col("score")) else max(col("score"))).as("__best"))
      .groupBy("query_id")
      .agg(graft.functions.TopKByScore.topK(col("__grp"), col("__best"), k, asc)
        .as("matches"))
      .select(col("query_id"), posexplode(col("matches")).as(Seq("__pos", "m")))
      .select(col("query_id"), col("m.id").as("match_group"),
        (col("__pos") + 1).cast("int").as("rank"))
  }

  /** Exact top-k, window strategy. Output: query cols + (match_id, score,
    * rank). Tie-break (score, match_id asc) is deterministic (FIXTURES §C).
    */
  def topKFlat(
      queries: DataFrame, qId: String, qVec: String,
      corpus: DataFrame, cId: String, cVec: String,
      k: Int, metric: String = "dot"): DataFrame = {
    val c = broadcast(corpus.select(col(cId).as("match_id"), col(cVec).as("__cvec")))
    val scored = queries
      .crossJoin(c)
      .withColumn("score", scoreCol(metric)(col(qVec), col("__cvec")))
      .drop("__cvec")
    val w = Window.partitionBy(col(qId)).orderBy(orderFor(metric): _*)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Exact FILTERED top-k: a metadata predicate restricts the corpus
    * BEFORE scoring (the pre-filter strategy — Atlas `$vectorSearch`'s
    * `filter` option; reference README.md:355-366 exposes the same
    * search shape). Pre-filtering is exact at any selectivity: the k
    * nearest of the admitted subset, never "the admitted among the k
    * nearest" (which post-filtering under-fills on selective
    * predicates). The predicate lands in the corpus scan, so at 100 TB
    * it prunes at the parquet reader (`PushedFilters`), not after a
    * full decode.
    */
  def topKFiltered(
      queries: DataFrame, qId: String, qVec: String,
      corpus: DataFrame, cId: String, cVec: String,
      filter: Column, k: Int, metric: String = "dot"): DataFrame =
    topKFlat(queries, qId, qVec, corpus.filter(filter), cId, cVec, k, metric)

  /** Exact RANGE (radius) search: every corpus vector within `threshold`
    * of each query — similarity ≥ threshold for dot/cosine, distance ≤
    * threshold for l2 — the fixed-radius twin of top-k (FAISS
    * `range_search`). Output (qId, match_id, score), UNranked: a radius
    * result is a set, not a ladder.
    *
    * The broadcast is byte-guarded (the [[topKBroadcast]] stats check):
    * beyond `maxCorpusBytes` the SAME exact |Q|×|C| scan runs as a
    * replicated-block shuffle equi-join ([[groupMaxSimTopK]]'s fallback
    * shape — queries replicate across block ids, corpus rows hash to
    * one block each, AQE-splittable) so exactness is preserved with no
    * driver-memory hazard. [[radiusLsh]] remains the preferred scale
    * path when approximate recall is acceptable — it prunes the scan
    * instead of distributing it.
    */
  def radiusFlat(
      queries: DataFrame, qId: String, qVec: String,
      corpus: DataFrame, cId: String, cVec: String,
      threshold: Double, metric: String = "dot",
      maxCorpusBytes: Long = 1L << 30): DataFrame =
    radiusAdmitted(queries, qVec,
      corpus.select(col(cId).as("match_id"), col(cVec).as("__cvec")),
      corpus, threshold, metric, maxCorpusBytes)
      .drop("__cvec")

  /** The admitted (query row × corpus row) stream every radius surface
    * is built from: byte-guarded broadcast cross join (beyond
    * `maxCorpusBytes` the same exact scan runs as a replicated-block
    * shuffle equi-join), exact score, true-threshold cut. `c` must
    * carry (`match_id`, `__cvec`, extra columns as needed); `statsOf`
    * is the UNPROJECTED corpus the byte estimate reads (Catalyst file
    * statistics live on the source plan).
    */
  private def radiusAdmitted(
      queries: DataFrame, qVec: String, c: DataFrame, statsOf: DataFrame,
      threshold: Double, metric: String, maxCorpusBytes: Long): DataFrame = {
    val scored =
      if (statsOf.queryExecution.optimizedPlan.stats.sizeInBytes <=
          BigInt(maxCorpusBytes))
        queries.crossJoin(broadcast(c))
      else {
        val nBlocks = queries.sparkSession.sessionState.conf.numShufflePartitions
        val cB = c.withColumn("__blk",
          pmod(xxhash64(col("match_id"), col("__cvec")), lit(nBlocks)).cast("int"))
        val qB = queries.withColumn("__blk",
          explode(sequence(lit(0), lit(nBlocks - 1))))
        qB.join(cB, "__blk").drop("__blk")
      }
    scored
      .withColumn("score", scoreCol(metric)(col(qVec), col("__cvec")))
      .filter(radiusPred(metric, threshold))
  }

  /** Facet counts over a radius result — the Atlas `$searchMeta` facet
    * shape next to `$vectorSearch`: for each query, how many admitted
    * matches (similarity within `threshold`) fall in each bucket of
    * `facetCol`. One pass: the counts aggregate the SAME admitted
    * stream [[radiusFlat]] emits (partial map-side combine on
    * (query, facet) — never a second scoring scan, never a window).
    * Output (qId, facet, n).
    */
  def radiusFacetCounts(
      queries: DataFrame, qId: String, qVec: String,
      corpus: DataFrame, cId: String, cVec: String, facetCol: String,
      threshold: Double, metric: String = "cosine",
      maxCorpusBytes: Long = 1L << 30): DataFrame =
    radiusAdmitted(queries, qVec,
      corpus.select(col(cId).as("match_id"), col(cVec).as("__cvec"),
        col(facetCol).as("facet")),
      corpus, threshold, metric, maxCorpusBytes)
      .groupBy(col(qId), col("facet"))
      .agg(count(lit(1)).as("n"))

  /** Admission predicate for a radius query: l2 keeps the ball's inside
    * (distance ≤ r), similarity metrics keep the cap above it (score ≥ τ).
    */
  private[operators] def radiusPred(metric: String, threshold: Double): Column =
    if (metric == "l2") col("score") <= threshold else col("score") >= threshold

  /** LSH-bucketed radius search (the scale path): sign-random-projection
    * buckets (Charikar 2002) prune the |Q|x|C| cross product to an
    * equi-join on (table, bucket), survivors are re-scored EXACTLY and
    * cut at the true threshold. Precision is therefore 1.0 by
    * construction — every emitted pair genuinely clears `threshold` —
    * and only recall is approximate (a pair must share ≥1 of `nTables`
    * buckets to be seen; miss probability decays as (1-p^nBits)^nTables
    * with p = 1 - θ/π the per-hyperplane agreement). The economics
    * follow the threshold: a HIGH threshold (near-dup radius, p → 1)
    * gets high recall from few tables and narrow buckets — the regime
    * LSH is built for — while a moderate threshold (τ=0.3 cosine is
    * p≈0.6) must buy recall with table count, trading candidate volume
    * (≈ |C|·nTables/2^nBits per query) against the full-scan baseline.
    * [[radiusRecallContract]] pins the achieved recall against the
    * exact twin.
    */
  def radiusLsh(
      queries: DataFrame, qId: String, qVec: String,
      corpus: DataFrame, cId: String, cVec: String,
      threshold: Double, metric: String = "cosine",
      nBits: Int = 4, nTables: Int = 8, dim: Int = 64): DataFrame = {
    val qb = queries.select(col(qId), col(qVec),
      posexplode(Lsh.bucketsCol(col(qVec), nBits, nTables, dim))
        .as(Seq("tbl", "bucket")))
    val cb = corpus.select(col(cId).as("match_id"), col(cVec).as("__cvec"))
      .select(col("match_id"), col("__cvec"),
        posexplode(Lsh.bucketsCol(col("__cvec"), nBits, nTables, dim))
          .as(Seq("tbl", "bucket")))
    qb.join(cb, Seq("tbl", "bucket")).drop("tbl", "bucket")
      .dropDuplicates(qId, "match_id")
      .withColumn("score", scoreCol(metric)(col(qVec), col("__cvec")))
      .filter(radiusPred(metric, threshold))
      .drop("__cvec")
  }

  /** Per-query radius recall gate: TRUE when the approximate result
    * recovered at least `minFrac` of the exact result's matches (a query
    * whose exact ball is empty passes trivially). Same shape as
    * [[recallContract]] but fraction-based — radius result sizes vary
    * per query, so a fixed hit count would gate loose queries loosely
    * and tight queries not at all.
    */
  def radiusRecallContract(
      approx: DataFrame, exact: DataFrame, queries: DataFrame,
      qId: String, matchId: String, minFrac: Double): DataFrame = {
    val hits = approx.select(col(qId), col(matchId))
      .join(exact.select(col(qId), col(matchId)), Seq(qId, matchId))
      .groupBy(qId).agg(count(lit(1)).as("__hits"))
    val want = exact.groupBy(qId).agg(count(lit(1)).as("__n"))
    queries.select(col(qId))
      .join(want, Seq(qId), "left")
      .join(hits, Seq(qId), "left")
      .select(col(qId),
        (coalesce(col("__n"), lit(0L)) === 0L ||
          coalesce(col("__hits"), lit(0L)) >=
            ceil(lit(minFrac) * col("__n")).cast("long")).as("recall_ok"))
  }

  /** Exact top-k, bounded-heap aggregation strategy (the scale path).
    * Output: one row per query with `matches ARRAY<STRUCT<id,score>>`
    * sorted best-first. The aggregate is the native
    * [[graft.functions.TopKByScore]] TypedImperativeAggregate: map-side
    * partial aggregation means only ≤k rows per query per partition reach
    * the shuffle — the |Q|x|C| scored cross product never hits disk.
    */
  def topKAgg(
      queries: DataFrame, qId: String, qVec: String,
      corpus: DataFrame, cId: String, cVec: String,
      k: Int, metric: String = "dot"): DataFrame = {
    val asc = metric == "l2"
    val c = broadcast(corpus.select(col(cId).as("match_id"), col(cVec).as("__cvec")))
    spreadSmallInput(queries)
      .crossJoin(c)
      .withColumn("score", scoreCol(metric)(col(qVec), col("__cvec")))
      .groupBy(col(qId))
      .agg(TopKByScore.topK(col("match_id"), col("score"), k, asc).as("matches"))
  }

  /** The query side drives the parallelism of the scoring join: a small
    * query table read from one parquet split would put the whole |Q|x|C|
    * scan in a single task. Fan it out to the session's shuffle
    * parallelism when it arrives under-partitioned (the shuffled data is
    * only (id, vec) — tiny relative to the scoring work it unlocks).
    */
  private def spreadSmallInput(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Fastest exact path when the corpus fits on one executor: collect the
    * corpus once, broadcast it, and compute each query's top-k inside a
    * single narrow projection — the |Q|x|C| intermediate relation never
    * exists, there is NO shuffle at all, and the plan is a pure map over
    * the query scan (linear scale-out over query splits; this is exactly
    * the shape the reference's per-row `FEDERATED_SEARCH` lateral join
    * has, README.md:404-407). Falls back to [[topKAgg]] when the corpus
    * exceeds `maxCorpusRows`.
    *
    * Output: (qId, matches ARRAY<STRUCT<id,score>>), best-first.
    */
  def topKBroadcast(
      queries: DataFrame, qId: String, qVec: String,
      corpus: DataFrame, cId: String, cVec: String,
      k: Int, metric: String = "dot",
      maxCorpusRows: Int = 2000000,
      maxCorpusBytes: Long = 1L << 30): DataFrame = {
    // Byte-aware guard BEFORE the driver collect: a row cap alone is not a
    // memory cap (2M rows of 1536-dim float is ~12 GB — far past the
    // clamped 16g heap). Catalyst's size statistics (file bytes for file
    // sources) cost no job; beyond the byte cap the search stays
    // distributed via topKAgg.
    if (corpus.queryExecution.optimizedPlan.stats.sizeInBytes > BigInt(maxCorpusBytes))
      return topKAgg(queries, qId, qVec, corpus, cId, cVec, k, metric)
        .select(col(qId), col("matches"))
    val collected = corpus
      .select(col(cId).cast("long"), col(cVec).cast("array<float>"))
      .filter(col(cId).isNotNull && col(cVec).isNotNull)
      .limit(maxCorpusRows + 1)
      .collect()
    if (collected.length > maxCorpusRows)
      return topKAgg(queries, qId, qVec, corpus, cId, cVec, k, metric)
        .select(col(qId), col("matches"))
    val ids = collected.map(_.getLong(0))
    val vecs = collected.map(_.getSeq[Float](1).toArray)
    val bc = queries.sparkSession.sparkContext.broadcast((ids, vecs))
    val asc = metric == "l2"
    val m = metric
    val scan = udf((q: Seq[Float]) => {
      val (cids, cvecs) = bc.value
      val qa = if (q == null) Array.empty[Float] else q.toArray
      val heap = new TopKHeap(k, asc)
      var i = 0
      while (i < cids.length) {
        heap.insert(cids(i), scoreF32(m, qa, cvecs(i)))
        i += 1
      }
      (0 until heap.n).map(j => ScoredId(heap.ids(j), heap.scores(j)))
    })
    spreadSmallInput(queries).select(col(qId), scan(col(qVec)).as("matches"))
  }

  /** Float32 scoring on plain arrays — bit-identical to the Catalyst
    * expressions in [[graft.functions.VectorExprs]] (and to DuckDB's list
    * functions), so every strategy returns identical scores.
    */
  def scoreF32(metric: String, a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    metric match {
      case "dot" =>
        var acc = 0.0f; var i = 0
        while (i < n) { acc += a(i) * b(i); i += 1 }
        acc.toDouble
      case "cosine" =>
        var dot = 0.0f; var aa = 0.0f; var bb = 0.0f; var i = 0
        while (i < n) { val x = a(i); val y = b(i); dot += x * y; aa += x * x; bb += y * y; i += 1 }
        val cos = dot / (math.sqrt(aa).toFloat * math.sqrt(bb).toFloat)
        (if (cos > 1.0f) 1.0f else if (cos < -1.0f) -1.0f else cos).toDouble
      case "l2" =>
        var acc = 0.0f; var i = 0
        while (i < n) { val d = a(i) - b(i); acc += d * d; i += 1 }
        math.sqrt(acc.toDouble)
      case other => throw new IllegalArgumentException(s"unknown metric $other")
    }
  }

  /** J2 result shape: append `search_results ARRAY<ROW<content STRING>>`
    * to each query row, like the reference's lateral FEDERATED_SEARCH
    * (README.md:426-433): corpus payload columns projected into an array
    * of structs, best match first.
    */
  def searchResults(
      queries: DataFrame, qId: String, qVec: String,
      corpus: DataFrame, cId: String, cVec: String,
      payload: Seq[String], k: Int, metric: String = "dot"): DataFrame = {
    // Slim the streamed side to (id, vec) before the scoring join: any
    // shuffle must never carry query payload (text) columns — at sf0.1
    // that is the difference between a ~25 GB shuffle and a few MB.
    val slim = queries.select(col(qId), col(qVec))
    val top = topKBroadcast(slim, qId, qVec, corpus, cId, cVec, k, metric)
      .select(col(qId), posexplode(col("matches")).as(Seq("rank", "m")))
      .select(col(qId), col("rank"), col("m.id").as("match_id"))
    // Reattach the projected payload columns (broadcast: corpus is the
    // small side by construction) and fold best-first into one array.
    val pay = broadcast(
      corpus.select((Seq(cId) ++ payload).map(col): _*).withColumnRenamed(cId, "match_id"))
    val withPayload = top.join(pay, "match_id")
    val resultStruct = struct(payload.map(col): _*).as("r")
    val grouped = withPayload
      .groupBy(col(qId))
      .agg(transform(
        array_sort(collect_list(struct(col("rank"), resultStruct))),
        x => x("r")).as("search_results"))
    // left join: a query with no candidates (empty corpus, null id) still
    // surfaces, with an empty search_results array
    queries.join(grouped, Seq(qId), "left")
      .withColumn("search_results",
        coalesce(col("search_results"),
          array().cast(grouped.schema("search_results").dataType)))
  }

  /** LSH-pruned approximate top-k for corpora beyond broadcast size.
    * Sign-random-projection (hyperplane) LSH: bucket id = the `nBits`-bit
    * sign pattern of projections onto deterministic pseudo-random
    * hyperplanes. Queries and corpus join on bucket equality — an equi
    * (shuffle or broadcast) join on `bucket`, NOT a cross product — then
    * exact scoring + top-k within the candidate set. Recall < 1; raise
    * `nTables` (multi-probe over independent hyperplane sets) to trade
    * compute for recall, like Atlas' `numCandidates` (README.md:364,368).
    */
  def annTopK(
      queries: DataFrame, qId: String, qVec: String,
      corpus: DataFrame, cId: String, cVec: String,
      k: Int, metric: String = "dot",
      nBits: Int = 8, nTables: Int = 4, dim: Int = 64): DataFrame = {
    // all tables in one pass per side: (table, bucket) rows from a
    // single scan, one equi-join on the pair — the per-table
    // join-then-union form scanned both sides nTables times
    val qb = queries.select(col(qId), col(qVec),
      posexplode(Lsh.bucketsCol(col(qVec), nBits, nTables, dim))
        .as(Seq("tbl", "bucket")))
    val cb = corpus.select(col(cId).as("match_id"), col(cVec).as("__cvec"))
      .select(col("match_id"), col("__cvec"),
        posexplode(Lsh.bucketsCol(col("__cvec"), nBits, nTables, dim))
          .as(Seq("tbl", "bucket")))
    val candidates = qb.join(cb, Seq("tbl", "bucket")).drop("tbl", "bucket")
      .dropDuplicates(qId, "match_id")
      .withColumn("score", scoreCol(metric)(col(qVec), col("__cvec")))
      .drop("__cvec")
    val w = Window.partitionBy(col(qId)).orderBy(orderFor(metric): _*)
    candidates.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Candidate-pool bound shared by the ANN entry points, mirroring the
    * reference's `numCandidates` rule: "must be less than or equal to
    * 10,000" (reference README.md:364,368).
    */
  def requireNumCandidates(n: Int): Unit =
    require(n >= 1 && n <= 10000,
      s"numCandidates must be in [1, 10000] (reference README.md:368), got $n")

  /** [[annTopK]] tuned from a `numCandidates` budget — the reference's
    * ANN knob (README.md:364,368) instead of raw (nBits, nTables): the
    * expected candidate pool per query is ~|C| * nTables / 2^nBits, so
    * nBits is chosen as the smallest width that brings the pool under
    * the budget. Recall rises with the budget, like Atlas.
    */
  def annTopKCandidates(
      queries: DataFrame, qId: String, qVec: String,
      corpus: DataFrame, cId: String, cVec: String,
      k: Int, metric: String = "dot",
      numCandidates: Int = 10000, nTables: Int = 4, dim: Int = 64,
      corpusRows: Option[Long] = None): DataFrame = {
    requireNumCandidates(numCandidates)
    require(k <= numCandidates, s"k=$k exceeds numCandidates=$numCandidates")
    val n = corpusRows.getOrElse(estimatedRows(corpus, dim))
    annTopK(queries, qId, qVec, corpus, cId, cVec, k, metric,
      bitsForBudget(n, nTables, numCandidates), nTables, dim)
  }

  /** nBits from a candidate budget: the smallest bucket width whose
    * expected per-query pool (~n * nTables / 2^nBits) fits the budget.
    */
  def bitsForBudget(n: Long, nTables: Int, numCandidates: Int): Int = {
    val pool = n.toDouble * nTables / numCandidates
    math.max(1, math.min(16,
      math.ceil(math.log(math.max(1.0, pool)) / math.log(2.0)).toInt))
  }

  /** Corpus row count for budget tuning WITHOUT running a job: Catalyst's
    * logical statistics (file bytes for file sources) divided by the
    * (id, dim-float-vector) row width. Budget sizing is a heuristic knob,
    * so a byte-derived estimate serves exactly as well as an exact count —
    * and a 100 TB corpus cannot afford a full scan per query batch just to
    * pick nBits/nProbe. Callers with a known cardinality pass it
    * explicitly via `corpusRows`.
    */
  private[graft] def estimatedRows(df: DataFrame, dim: Int): Long = {
    val stats = df.queryExecution.optimizedPlan.stats
    stats.rowCount.map(_.toLong).getOrElse(
      math.max(1L, (stats.sizeInBytes / (8L + 4L * dim)).toLong))
  }

  /** Recall contract for an approximate search against its exact twin:
    * per query, `recall_ok` = at least `minHits` of the approximate
    * matches appear in the exact top-k. Turns a non-deterministic-looking
    * (but in fact fully deterministic) ANN result into an
    * oracle-checkable accuracy assertion — the oracle emits the query
    * list with literal TRUE, so any recall regression flips a boolean
    * and fails the hash (same pattern as the HLL 5% contract).
    *
    * Both inputs are (qId, matchId) projections; `queries` left-joins so
    * a query with ZERO overlapping matches still surfaces (as false).
    */
  def recallContract(
      approx: DataFrame, exact: DataFrame, queries: DataFrame,
      qId: String, matchId: String, minHits: Long): DataFrame = {
    val hits = approx.select(col(qId), col(matchId))
      .join(exact.select(col(qId), col(matchId)), Seq(qId, matchId))
      .groupBy(qId).agg(count(lit(1)).as("__hits"))
    queries.select(col(qId)).join(hits, Seq(qId), "left")
      .select(col(qId), (coalesce(col("__hits"), lit(0L)) >= minHits).as("recall_ok"))
  }
}

/** Sign-random-projection LSH (Charikar, STOC 2002): deterministic
  * hyperplanes derived from a seeded xorshift-style hash so every executor
  * generates identical planes with no broadcast state.
  */
object Lsh {
  def hyperplane(table: Int, bit: Int, dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      // splitmix64 on (table, bit, i) -> uniform in [-1, 1)
      var z = (table.toLong << 40) ^ (bit.toLong << 20) ^ i.toLong ^ 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      v(i) = ((z >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0).toFloat
      i += 1
    }
    v
  }

  /** All `nBits` hyperplanes of one table, flattened row-major into a
    * single array — built ONCE (driver side, captured in the UDF closure)
    * instead of allocating nBits fresh Array[Float](dim) per input row.
    */
  def planeMatrix(table: Int, nBits: Int, dim: Int): Array[Float] = {
    val m = new Array[Float](nBits * dim)
    var bit = 0
    while (bit < nBits) {
      System.arraycopy(hyperplane(table, bit, dim), 0, m, bit * dim, dim)
      bit += 1
    }
    m
  }

  /** Bucket id from a prebuilt plane matrix: one pass of nBits dot
    * products with zero per-row allocation.
    */
  def bucket(vec: Seq[Float], nBits: Int, dim: Int, planes: Array[Float]): Int = {
    val v = vec match {
      case w: scala.collection.immutable.ArraySeq[_]
          if w.unsafeArray.isInstanceOf[Array[Float]] =>
        w.unsafeArray.asInstanceOf[Array[Float]]
      case other => other.toArray
    }
    val n = math.min(v.length, dim)
    var b = 0
    var bit = 0
    while (bit < nBits) {
      var dot = 0.0
      var i = 0
      val off = bit * dim
      while (i < n) { dot += v(i) * planes(off + i); i += 1 }
      if (dot >= 0) b |= (1 << bit)
      bit += 1
    }
    b
  }

  def bucketCol(vec: Column, nBits: Int, table: Int, dim: Int): Column = {
    val planes = planeMatrix(table, nBits, dim)
    udf((v: Seq[Float]) => bucket(v, nBits, dim, planes)).apply(vec)
  }

  /** Every table's bucket id in ONE pass (`posexplode` the result to
    * (table, bucket) rows): per-table values are bit-identical to
    * [[bucketCol]], but the input is scanned once instead of once per
    * table — union branches don't share work, so the per-table
    * union-of-selects form re-read the corpus `nTables` times.
    */
  def bucketsCol(vec: Column, nBits: Int, nTables: Int, dim: Int): Column = {
    val planes = Array.tabulate(nTables)(t => planeMatrix(t, nBits, dim))
    udf((v: Seq[Float]) => planes.map(p => bucket(v, nBits, dim, p))).apply(vec)
  }
}

/** Match element shape shared by the top-k strategies. */
case class ScoredId(id: Long, score: Double)
