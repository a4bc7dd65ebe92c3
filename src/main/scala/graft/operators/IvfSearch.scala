package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.VectorSearch.{scoreCol, scoreF32}

/** IVF (inverted-file) approximate nearest neighbour — the clustering
  * counterpart to the LSH path in [[VectorSearch.annTopK]], mirroring the
  * recall/latency knob of the reference's ANN index (`numCandidates`,
  * reference README.md:364,368): corpus vectors are partitioned into
  * `nList` Voronoi cells around k-means centroids; each query probes only
  * the `nProbe` nearest cells, so exact scoring touches ~|C|*nProbe/nList
  * candidates instead of the full corpus.
  *
  * Scale shape (the 100 TB posture):
  *  - training: `iters` Lloyd rounds; each is one narrow map over the
  *    corpus (centroids broadcast) + one tiny aggregation. Per-dimension
  *    sums use integer arithmetic (round(v*1e7) accumulated as LONG), so
  *    centroid means are bit-identical regardless of partitioning —
  *    floating-point partial-sum order can never flip an assignment.
  *  - index: the corpus gains a `cell` column — at rest this would be a
  *    partition/bucket column, so a probe prunes file-level partitions.
  *  - query: queries explode to nProbe (query, cell) pairs and equi-join
  *    the celled corpus on `cell` — a shuffle join on a low-cardinality
  *    key (AQE handles the skew of popular cells), never a cross product.
  */
/** Drift report for one online append against a persisted IVF/IVF-PQ
  * index ([[IvfSearch.appendToIndex]] / [[IvfPqIndex.appendToIndex]]).
  * Appended vectors are assigned to STORED centroids, so a sustained
  * distribution shift silently degrades recall: residuals grow (vectors
  * sit far from every trained centroid) and occupancy concentrates (new
  * mass crowds a few cells, defeating probe pruning). Both are measured
  * per batch against the baseline recorded at `writeIndex` time;
  * `retrainRecommended` fires when either leaves the trained regime —
  * the signal to schedule the offline retrain leg of the
  * online-append/offline-retrain split.
  *
  * `occupancySkew` is maxCellShare × nList: 1.0 = perfectly uniform,
  * nList = everything in one cell. Baselines are NaN (and the signal
  * stays quiet) for a pre-stats index.
  */
case class AppendStats(
    rows: Long,
    meanResidual: Double,
    occupancySkew: Double,
    baselineMeanResidual: Double,
    baselineOccupancySkew: Double,
    retrainRecommended: Boolean)

object IvfSearch {

  /** Drift thresholds: a batch whose mean assigned-centroid distance
    * exceeds 1.5× the training baseline, or whose occupancy skew
    * exceeds 2× the training skew, is out of the trained regime.
    */
  val ResidualDriftFactor = 1.5
  val OccupancyDriftFactor = 2.0

  /** Deterministic k-means centroids over `ARRAY<FLOAT>` vectors. */
  def trainCentroids(
      corpus: DataFrame, cVec: String, cId: String,
      nList: Int, iters: Int = 2, dim: Int = 64): Array[Array[Float]] = {
    // init: first nList vectors by id — deterministic and cheap; Lloyd
    // rounds wash out the arbitrary start.
    var centroids: Array[Array[Float]] = corpus
      .orderBy(col(cId)).limit(nList).select(cVec).collect()
      .map(_.getSeq[Float](0).toArray)
    val scale = 1e7
    (1 to iters).foreach { _ =>
      val assigned = corpus.select(
        nearestCell(centroids)(col(cVec)).as("cell"),
        posexplode(col(cVec)).as(Seq("dim", "v")))
      val sums = assigned
        .groupBy("cell", "dim")
        .agg(sum(round(col("v") * scale).cast("long")).as("s"), count(lit(1)).as("n"))
        .collect()
      val acc = Array.fill(nList)(new Array[Float](dim))
      val counts = new Array[Long](nList)
      sums.foreach { r =>
        val cell = r.getInt(0); val d = r.getInt(1)
        acc(cell)(d) = (r.getLong(2).toDouble / scale / r.getLong(3)).toFloat
        counts(cell) = r.getLong(3)
      }
      // empty cells keep their previous centroid
      centroids = centroids.zipWithIndex.map { case (old, i) =>
        if (counts(i) > 0) acc(i) else old
      }
    }
    centroids
  }

  /** Column: index of the nearest centroid (L2), ties to the lower id. */
  def nearestCell(centroids: Array[Array[Float]])(vec: Column): Column = {
    val cs = centroids
    udf((v: Seq[Float]) => {
      val q = v.toArray
      var best = 0; var bestD = Double.MaxValue
      var i = 0
      while (i < cs.length) {
        val d = scoreF32("l2", q, cs(i))
        if (d < bestD) { bestD = d; best = i }
        i += 1
      }
      best
    }).apply(vec)
  }

  /** Column: indices of the `nProbe` nearest centroids, best first. */
  def nearestCells(centroids: Array[Array[Float]], nProbe: Int)(vec: Column): Column = {
    val cs = centroids
    udf((v: Seq[Float]) => {
      val q = v.toArray
      cs.indices
        .map(i => (i, scoreF32("l2", q, cs(i))))
        .sortBy { case (i, d) => (d, i) }
        .take(nProbe).map(_._1)
    }).apply(vec)
  }

  /** IVF top-k: train (or reuse) centroids, cell-partition the corpus,
    * probe nProbe cells per query, exact top-k within candidates.
    * Output: (qId, match_id, score, rank), rank 1 = best.
    */
  def ivfTopK(
      queries: DataFrame, qId: String, qVec: String,
      corpus: DataFrame, cId: String, cVec: String,
      k: Int, metric: String = "dot",
      nList: Int = 16, nProbe: Int = 4, iters: Int = 2,
      dim: Int = 64): DataFrame = {
    val centroids = trainCentroids(corpus, cVec, cId, nList, iters, dim)
    val celled = corpus.select(col(cId).as("match_id"), col(cVec).as("__cvec"),
      nearestCell(centroids)(col(cVec)).as("cell"))
    val probed = queries.select(col(qId), col(qVec),
      explode(nearestCells(centroids, nProbe)(col(qVec))).as("cell"))
    val asc = metric == "l2"
    val scored = probed.join(celled, "cell")
      .withColumn("score", scoreCol(metric)(col(qVec), col("__cvec")))
      .groupBy(col(qId))
      .agg(graft.functions.TopKByScore.topK(col("match_id"), col("score"), k, asc).as("matches"))
    scored
      .select(col(qId), posexplode(col("matches")).as(Seq("rank0", "m")))
      .select(col(qId), col("m.id").as("match_id"), col("m.score").as("score"),
        (col("rank0") + 1).cast("int").as("rank"))
  }

  /** [[ivfTopK]] tuned from a `numCandidates` budget — the reference's
    * ANN knob (README.md:364,368) instead of raw nProbe: candidates per
    * query are ~|C| * nProbe / nList, so nProbe is the largest probe
    * count that keeps the pool within the budget (≥1 so a query always
    * probes its own cell).
    */
  def ivfTopKCandidates(
      queries: DataFrame, qId: String, qVec: String,
      corpus: DataFrame, cId: String, cVec: String,
      k: Int, metric: String = "dot",
      numCandidates: Int = 10000, nList: Int = 16, iters: Int = 2,
      dim: Int = 64, corpusRows: Option[Long] = None): DataFrame = {
    VectorSearch.requireNumCandidates(numCandidates)
    require(k <= numCandidates, s"k=$k exceeds numCandidates=$numCandidates")
    // statistics-based (no scan) unless the caller knows the cardinality —
    // see VectorSearch.estimatedRows for why a count job is unaffordable
    val n = corpusRows.getOrElse(VectorSearch.estimatedRows(corpus, dim))
    ivfTopK(queries, qId, qVec, corpus, cId, cVec, k, metric, nList,
      probesForBudget(n, nList, numCandidates), iters, dim)
  }

  /** nProbe from a candidate budget: the largest probe count keeping the
    * expected pool (~n * nProbe / nList) within budget; ≥1 so a query
    * always probes its own cell.
    */
  def probesForBudget(n: Long, nList: Int, numCandidates: Int): Int =
    math.max(1, math.min(nList,
      (numCandidates.toLong * nList / math.max(1L, n)).toInt))

  // --- at-rest index: cell as a PARTITION column -------------------------

  /** Materialize the IVF index on disk: the celled corpus partitioned BY
    * `cell` (so a probe prunes whole partition directories at file-listing
    * time — the at-rest layout the Scaladoc above promises), plus the
    * trained centroids for reload. Index once, search many.
    */
  def writeIndex(
      corpus: DataFrame, cId: String, cVec: String, path: String,
      nList: Int = 16, iters: Int = 2, dim: Int = 64,
      payload: Seq[String] = Nil): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // payload columns ride ALONGSIDE the vectors in the store (the
    // filtered-search layout: a metadata predicate evaluates inside the
    // partition-pruned probe scan as a parquet PushedFilter, instead of
    // joining back to the source corpus per query batch). Reserved
    // store column names can't be payload.
    val reserved = Set("id", "vec", "cell", "epoch")
    payload.foreach(p => require(!reserved(p),
      s"payload column '$p' collides with a reserved store column ($reserved)"))
    val centroids = trainCentroids(corpus, cVec, cId, nList, iters, dim)
    val celled = corpus.select(col(cId).as("id") +: col(cVec).as("vec") +:
      nearestCell(centroids)(col(cVec)).as("cell") +: payload.map(col): _*)
    // inner epoch partition level: the base build is epoch -1; streamed
    // appends land as dynamic overwrites of their own epoch dirs, making
    // at-least-once foreachBatch replays idempotent (see appendToIndex)
    celled.withColumn("epoch", lit(-1L))
      .write.partitionBy("cell", "epoch").mode("overwrite")
      .parquet(s"$path/corpus")
    centroids.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    // training baseline for online-append drift detection — aggregated
    // over the parquet just written, not the source plan, so the build
    // never pays a second corpus scan + assignment pass
    val persisted = spark.read.parquet(s"$path/corpus")
    writeStats(spark, path, celledStats(
      persisted.withColumn("__dist", cellDist(centroids)(col("vec"), col("cell"))),
      centroids.length))
  }

  /** Distance of a vector to its ASSIGNED centroid — the same L2 the
    * assignment minimized, so drift is measured in assignment units.
    */
  private[operators] def cellDist(
      centroids: Array[Array[Float]])(vec: Column, cell: Column): Column = {
    val cs = centroids
    udf((v: Seq[Float], c: Int) => scoreF32("l2", v.toArray, cs(c))).apply(vec, cell)
  }

  /** (rows, mean assigned-centroid distance, occupancy skew) of a celled
    * frame carrying a `__dist` column — ONE aggregation job (per-cell
    * partials, ≤ nList rows to the driver).
    */
  private[operators] def celledStats(
      celled: DataFrame, nList: Int): (Long, Double, Double) = {
    val perCell = celled.groupBy("cell")
      .agg(count(lit(1)).as("n"), sum(col("__dist")).as("s")).collect()
    if (perCell.isEmpty) return (0L, 0.0, 0.0)
    val n = perCell.map(_.getLong(1)).sum
    val mean = perCell.map(_.getDouble(2)).sum / n
    val skew = perCell.map(_.getLong(1)).max.toDouble * nList / n
    (n, mean, skew)
  }

  private[operators] def writeStats(
      spark: org.apache.spark.sql.SparkSession, path: String,
      stats: (Long, Double, Double)): Unit = {
    import spark.implicits._
    Seq((stats._2, stats._3)).toDF("mean_residual", "occupancy_skew")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Baseline recorded at writeIndex time; None for a pre-stats index. */
  private[operators] def loadStats(
      spark: org.apache.spark.sql.SparkSession, path: String): Option[(Double, Double)] =
    if (!FsUtil.exists(spark, s"$path/stats")) None
    else spark.read.parquet(s"$path/stats").collect().headOption
      .map(r => (r.getDouble(0), r.getDouble(1)))

  /** Compare one batch's stats to the stored baseline. The occupancy
    * clause only judges batches of at least 8×nList rows: a tiny
    * micro-batch is maximally skewed by construction (2 rows in 2 cells
    * of 16 reads as skew 8) and would false-fire on every small
    * in-distribution append — exactly the streaming path the signal
    * serves. Residual distance has no such size floor.
    */
  private[operators] def driftVerdict(
      batch: (Long, Double, Double), nList: Int,
      baseline: Option[(Double, Double)]): AppendStats = baseline match {
    case Some((bm, bs)) =>
      AppendStats(batch._1, batch._2, batch._3, bm, bs,
        retrainRecommended = batch._1 > 0 &&
          (batch._2 > ResidualDriftFactor * bm + 1e-12 ||
            (batch._1 >= 8L * nList && batch._3 > OccupancyDriftFactor * bs)))
    case None =>
      AppendStats(batch._1, batch._2, batch._3, Double.NaN, Double.NaN,
        retrainRecommended = false)
  }

  /** Append newly arrived vectors to a persisted index WITHOUT
    * retraining: cells come from the STORED centroids, rows land in
    * their cell's partition directory (dynamic-partition append). This
    * is the continuous-ingestion path — the at-rest analog of the
    * reference's perpetual INSERT keeping its collection searchable as
    * new embeddings arrive (README.md:432-445): index once, append
    * forever, probe pruning unchanged. Centroids drift only at the next
    * full [[writeIndex]] — the standard IVF split of offline retrain /
    * online append. Returns the batch's [[AppendStats]]: sustained
    * distribution drift against stored centroids silently degrades
    * recall, so every append measures itself against the training
    * baseline and recommends the retrain when it leaves the regime.
    */
  def appendToIndex(
      df: DataFrame, cId: String, cVec: String, path: String,
      epoch: Long = -1L): AppendStats = {
    val spark = df.sparkSession
    val centroids = loadCentroids(spark, path)
    // a payload store's appends MUST carry the same payload columns at
    // the same TYPES — an epoch written without them would serve NULL
    // under a filtered probe, and a mixed-type column fails the whole
    // store at compaction. The store's own schema (not caller memory)
    // is the contract ([[IndexMaintenance.requirePayloadCompatible]]).
    val storeSchema = spark.read.parquet(s"$path/corpus").schema
    val payloadCols = storeSchema.fieldNames
      .filterNot(Set("id", "vec", "cell", "epoch")).toSeq
    IndexMaintenance.requirePayloadCompatible(storeSchema, df.schema,
      payloadCols, path)
    // assign cells once; the partition write and the drift aggregation
    // both read the materialized assignment
    val celled = df.select(col(cId).as("id") +: col(cVec).as("vec") +:
        nearestCell(centroids)(col(cVec)).as("cell") +: payloadCols.map(col): _*)
      .localCheckpoint()
    // epoch >= 0: IDEMPOTENT append — a replayed micro-batch overwrites
    // its own (cell, epoch) partitions instead of duplicating vectors
    // (the streaming fronts always tag; ad-hoc batch appends default to
    // the plain append into the base segment). The write runs under the
    // store lease with swap recovery FIRST: a bare write after a
    // compactor crashed mid-swap would CREATE a fresh corpus dir holding
    // only this epoch, and the next compaction's recovery would then
    // discard the real store as debris.
    try {
      IndexMaintenance.withStoreLock(spark, path) {
        IndexMaintenance.recoverSwap(spark, s"$path/corpus")
        IndexMaintenance.epochWrite(celled.withColumn("epoch", lit(epoch)),
          Seq("cell", "epoch"), epoch, s"$path/corpus")
      }
      driftVerdict(
        celledStats(celled.withColumn("__dist",
          cellDist(centroids)(col("vec"), col("cell"))), centroids.length),
        centroids.length, loadStats(spark, path))
      // per-batch caller (ivfIndexStream / ivfCdcStream): release this
      // batch's checkpoint blocks in the finally, not at a future GC —
      // even when the write or the drift aggregation throws
    } finally IndexMaintenance.unpersistCheckpoint(celled)
  }

  def loadCentroids(spark: org.apache.spark.sql.SparkSession, path: String): Array[Array[Float]] =
    spark.read.parquet(s"$path/centroids").orderBy("cell").collect()
      .map(_.getSeq[Float](1).toArray)

  /** Delete `ids` from a persisted index (IVF or IVF-PQ — both share
    * the `corpus/cell=/epoch=` layout) WITHOUT rewriting it: a
    * tombstone epoch lands under the store lock and the rows die at
    * serve time immediately ([[searchIndex]] filters them); the next
    * [[compactIndex]] removes them physically and retires the
    * tombstone. Default epoch = the store's newest segment epoch
    * ("delete what's here now"): every current row of the id dies, a
    * LATER append of the same id out-lives the delete — the
    * last-writer-wins order appends already follow. Returns the
    * tombstone epoch used.
    */
  def deleteFromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      ids: DataFrame, idCol: String, epoch: Option[Long] = None): Long = {
    require(FsUtil.exists(spark, s"$path/centroids"),
      s"index at '$path' does not exist or is unreachable")
    IndexMaintenance.withStoreLock(spark, path) {
      IndexMaintenance.recoverSwap(spark, s"$path/corpus")
      val e = epoch.getOrElse(Tombstones.maxEpochIn(spark, s"$path/corpus"))
      Tombstones.write(spark, path, ids, idCol, e)
      e
    }
  }

  /** Compact the celled corpus to one file per (cell, epoch-segment) —
    * cures the per-append small-file decay (see [[IndexMaintenance]];
    * crash recovery of an interrupted swap runs first); probe pruning
    * and results are unchanged (same rows, same `cell=` partition
    * values; asserted in IvfSpec). All CLOSED epochs merge into the
    * base segment; `excludeEpoch` (a stream's in-flight epoch) keeps
    * its own partitions so its at-least-once replay can still
    * overwrite itself. Works for any store with the `corpus/cell=`
    * layout, so [[IvfPqIndex]] delegates here too. Returns (data files
    * before, after).
    */
  def compactIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      excludeEpoch: Long = Long.MinValue): (Long, Long) = {
    require(FsUtil.exists(spark, s"$path/centroids"),
      s"ivf index at '$path' does not exist or is unreachable")
    IndexMaintenance.withStoreLock(spark, path) {
      IndexMaintenance.recoverSwap(spark, s"$path/corpus")
      // deletes heal here: tombstoned rows drop PHYSICALLY from closed
      // segments (the in-flight epoch stays untouched — its
      // at-least-once replay must be able to overwrite itself; the
      // retained tombstone keeps its dead rows filtered at serve time).
      // The rule reads ORIGINAL epochs, so it runs before the
      // closed-epoch remap.
      val applyTombstones: DataFrame => DataFrame = df =>
        if (!Tombstones.exists(spark, path)) df
        else Tombstones.filterLive(spark, path,
            df.filter(col("epoch") =!= excludeEpoch), "id", "epoch")
          .unionByName(df.filter(col("epoch") === excludeEpoch))
      val res = IndexMaintenance.compactPartitionedDir(spark, s"$path/corpus",
        Seq("cell", "epoch"), loadCentroids(spark, path).length * 2,
        applyTombstones.andThen(IndexMaintenance.closedEpochsToBase(excludeEpoch)))
      Tombstones.clearApplied(spark, path, excludeEpoch)
      res
    }
  }

  /** Fixed-radius probe of a persisted index — FAISS `range_search` on
    * IVFFlat: `nProbe` cells per query from the stored centroids, EXACT
    * scoring of only the probed cells' vectors (the same partition-dir
    * pruning as [[searchIndex]]), true-threshold cut. Precision is 1.0
    * by construction (every emitted pair genuinely clears `threshold`);
    * recall is bounded by cell coverage — matches living in unprobed
    * cells are unseen, so a WIDE radius wants a high `nProbe` while a
    * near-dup radius (the common curation case) concentrates in the
    * query's own cells. [[VectorSearch.radiusRecallContract]] pins what
    * a setting achieves. `filter` rides the pruned scan like
    * [[searchIndex]]'s. Output (qId, match_id, score), UNranked set
    * semantics; an id re-appended across epochs collapses to its best
    * score.
    */
  def radiusIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, qId: String, qVec: String,
      threshold: Double, metric: String = "cosine", nProbe: Int = 4,
      filter: Column = lit(true)): DataFrame = {
    val centroids = loadCentroids(spark, path)
    val probed = queries.select(col(qId), col(qVec),
      explode(nearestCells(centroids, nProbe)(col(qVec))).as("cell"))
    val cells = probed.select("cell").distinct().collect().map(_.getInt(0))
    val celled = Tombstones.filterLive(spark, path,
        spark.read.parquet(s"$path/corpus")
          .filter(col("cell").isin(cells.map(Int.box).toIndexedSeq: _*))
          .filter(filter),
        "id", "epoch")
      .select(col("id").as("match_id"), col("vec").as("__cvec"), col("cell"))
    probed.join(celled, "cell")
      .withColumn("score", scoreCol(metric)(col(qVec), col("__cvec")))
      .filter(VectorSearch.radiusPred(metric, threshold))
      .groupBy(col(qId), col("match_id"))
      .agg((if (metric == "l2") min(col("score")) else max(col("score")))
        .as("score"))
  }

  /** Probe a persisted index. The union of probed cells across the query
    * batch (a driver-side collect bounded by nList — small by
    * construction) becomes an IN filter on the PARTITION column, so the
    * corpus scan lists only the probed cells' directories; unprobed
    * partitions are never opened. Semantics identical to [[ivfTopK]]
    * run with the stored centroids.
    *
    * `filter` (over the store's payload columns — see [[writeIndex]])
    * turns the probe into a FILTERED search: the predicate evaluates
    * inside the same pruned scan (a parquet `PushedFilter` stacked on
    * the partition pruning — no join back to the source corpus), and
    * only admitted vectors compete for the top-k. Pre-filtering keeps
    * results exact w.r.t. the probed cells at any selectivity, but a
    * selective predicate thins each probed cell's pool — raise `nProbe`
    * roughly by 1/selectivity to keep the effective candidate count,
    * the same budget arithmetic as [[probesForBudget]].
    */
  def searchIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, qId: String, qVec: String,
      k: Int, metric: String = "dot", nProbe: Int = 4,
      filter: Column = lit(true)): DataFrame = {
    val centroids = loadCentroids(spark, path)
    val probed = queries.select(col(qId), col(qVec),
      explode(nearestCells(centroids, nProbe)(col(qVec))).as("cell"))
    val cells = probed.select("cell").distinct().collect().map(_.getInt(0))
    // tombstoned rows die before scoring: a deleted id must not occupy a
    // top-k slot even transiently (filterLive is a no-op join-free path
    // when the store has no tombstones dir)
    val celled = Tombstones.filterLive(spark, path,
        spark.read.parquet(s"$path/corpus")
          .filter(col("cell").isin(cells.map(Int.box).toIndexedSeq: _*))
          .filter(filter),
        "id", "epoch")
      .select(col("id").as("match_id"), col("vec").as("__cvec"), col("cell"))
    val asc = metric == "l2"
    probed.join(celled, "cell")
      .withColumn("score", scoreCol(metric)(col(qVec), col("__cvec")))
      .groupBy(col(qId))
      .agg(graft.functions.TopKByScore.topK(col("match_id"), col("score"), k, asc).as("matches"))
      .select(col(qId), posexplode(col("matches")).as(Seq("rank0", "m")))
      .select(col(qId), col("m.id").as("match_id"), col("m.score").as("score"),
        (col("rank0") + 1).cast("int").as("rank"))
  }

  /** [[searchIndex]] with serve-time OBSERVABILITY — the vector-side
    * analogue of the BM25 scoreDetails frame (Atlas $vectorSearch's
    * explain/searchMeta shape): the same probe and the same scan, plus
    * the per-query counters the serve actually saw. `cells_probed` is
    * the planner stat (the declared probe budget — every query probes
    * exactly nProbe cells); `candidates_scanned` is the executor stat
    * (live rows in the query's probed cells that competed for the
    * top-k, post-tombstone, post-filter). Counts are deterministic
    * functions of (store, query batch, knobs) — under a FULL probe
    * `candidates_scanned` is exactly the store's live row count, which
    * puts the whole frame under an external hash oracle. One extra
    * `count` in the existing aggregation: observability costs no second
    * scan.
    */
  def explainProbe(
      spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, qId: String, qVec: String,
      k: Int, metric: String = "dot", nProbe: Int = 4,
      filter: Column = lit(true)): DataFrame = {
    val centroids = loadCentroids(spark, path)
    val probed = queries.select(col(qId), col(qVec),
      explode(nearestCells(centroids, nProbe)(col(qVec))).as("cell"))
    val cells = probed.select("cell").distinct().collect().map(_.getInt(0))
    val celled = Tombstones.filterLive(spark, path,
        spark.read.parquet(s"$path/corpus")
          .filter(col("cell").isin(cells.map(Int.box).toIndexedSeq: _*))
          .filter(filter),
        "id", "epoch")
      .select(col("id").as("match_id"), col("vec").as("__cvec"), col("cell"))
    val asc = metric == "l2"
    val agg = probed.join(celled, "cell")
      .withColumn("score", scoreCol(metric)(col(qVec), col("__cvec")))
      .groupBy(col(qId))
      .agg(graft.functions.TopKByScore.topK(col("match_id"), col("score"), k, asc).as("matches"),
        count(lit(1)).as("candidates_scanned"))
    // left-join back onto the query frame: a query whose probed cells
    // yield ZERO candidates (everything tombstoned or filtered out) must
    // surface with candidates_scanned = 0 and a null match row — the
    // queries that most need explaining must not vanish from the frame
    queries.select(col(qId)).distinct()
      .join(agg, Seq(qId), "left")
      .select(col(qId),
        coalesce(col("candidates_scanned"), lit(0L)).as("candidates_scanned"),
        posexplode_outer(col("matches")).as(Seq("rank0", "m")))
      .select(col(qId), col("m.id").as("match_id"),
        (col("rank0") + 1).cast("int").as("rank"),
        // the probe caps at the store's cell count: with nProbe > nList
        // the declared budget would over-report what was actually probed
        lit(math.min(nProbe, centroids.length)).cast("int").as("cells_probed"),
        col("candidates_scanned"))
  }
}
