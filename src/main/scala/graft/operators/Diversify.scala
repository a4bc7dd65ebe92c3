package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Data-diversification operators over an embedding column — the
  * "diversify" half of D4 (Tirumala et al. 2023, arXiv:2308.12284):
  * after semantic dedup ([[Dedup.semDedup]]) removes near-duplicate
  * points, prototypicality pruning removes the most *typical* points of
  * each semantic cluster (highest cosine to the cluster centroid), on
  * the finding that near-centroid web documents are semantically
  * redundant templates while outliers carry the diversity an LLM
  * pretraining mix wants.
  *
  * Scale shape:
  *  - centroids come from a partial-agg `groupBy(cell, dim)` over
  *    posexploded (cell, dim, value) slim rows — map-side combine, never
  *    a collect of vectors — then fold to one small (cell → vector)
  *    relation that broadcasts;
  *  - prototypicality is the codegen'd [[VectorFunctions.cosine_similarity]]
  *    against the broadcast centroid — one narrow pass;
  *  - the per-cell rank is a window over the CELL id, which is a bounded
  *    cluster label, not a Zipf-distributed content key: the k-means path
  *    hard-bounds cells at `maxCell` ([[Dedup.semDedup]]'s
  *    `assignCellsBounded`) and [[Dedup.suggestedClusters]] sizes the
  *    mean cell, so a window partition never exceeds the configured
  *    bound (unlike gram/line keys, which are unbounded by nature).
  */
object Diversify {

  /** Assign each vector to its nearest anchor by cosine (ties → lowest
    * anchor id). Anchors are a SMALL, caller-chosen set (the oracle path
    * uses the corpus' lowest-id vectors; a production path might use
    * per-domain exemplars) — they fold into the plan as literals, so
    * assignment is one narrow codegen pass with zero shuffles and zero
    * UDFs. The k-means twin at scale is [[IvfSearch.trainCentroids]] +
    * `nearestCell` (used by [[Dedup.semDedup]]); this anchor form exists
    * because it is exactly reproducible by a relational oracle (both
    * engines score bit-identical FLOAT[] inputs with bit-equal cosine
    * kernels, so the argmax is deterministic cross-engine).
    *
    * Output: (id, v, cell) with cell = the winning anchor's id.
    */
  def anchorCells(df: DataFrame, idCol: String, vecCol: String,
      anchors: Seq[(Long, Array[Float])]): DataFrame = {
    require(anchors.nonEmpty, "anchorCells needs at least one anchor")
    // fold to max struct(cos, -aid): field-order comparison gives the
    // highest cosine, ties to the lowest anchor id — the same winner as
    // the oracle's ORDER BY cos DESC, aid ASC
    val scored = anchors.map { case (aid, av) =>
      struct(
        VectorFunctions.cosine_similarity(col("v"), typedLit(av.toSeq)).as("c"),
        lit(-aid).as("naid"))
    }
    val best = if (scored.size == 1) scored.head else greatest(scored: _*)
    df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("cell", -best.getField("naid"))
  }

  /** Per-cell mean centroid as an ARRAY<FLOAT> — (cell, cvec).
    *
    * Partial-agg shape: posexplode to slim (cell, i, x) rows, two-phase
    * `avg` per (cell, dim) — hot cells fan across reducers on the
    * composite key and combine map-side — then `collect_list` folds each
    * cell's dims back into one array (exactly `dim` rows per (cell)
    * group, bounded). The f32 cast quantizes away the last-bit
    * sum-order wobble of distributed averaging, so a relational oracle
    * computing the same mean lands on the same float (DiversifySpec
    * asserts the quantized mean is summation-order-invariant on the
    * pinned corpus).
    */
  def cellCentroids(celled: DataFrame, vecCol: String,
      cellCol: String): DataFrame =
    celled.select(col(cellCol).as("cell"), posexplode(col(vecCol)).as(Seq("i", "x")))
      .groupBy("cell", "i").agg(avg(col("x")).as("m"))
      .groupBy("cell")
      .agg(transform(array_sort(collect_list(struct(col("i"), col("m")))),
        s => s.getField("m").cast("float")).as("cvec"))

  /** Prototypicality pruning (the D4 "SSL prototypes" stage): within
    * each cell, drop the `ceil(dropFrac * n_cell)` members MOST similar
    * to the cell's mean centroid — prototypes are redundant; outliers
    * diversify. Survivors: (id, cell, n_cell, proto_rank), proto_rank 1
    * = most prototypical (so survivors all have
    * proto_rank > ceil(dropFrac * n_cell)).
    *
    * `celled` must carry (idCol, vecCol, cellCol); cells must be
    * BOUNDED by construction (see the object doc — the rank window
    * partitions on the cell id).
    */
  def prototypePrune(celled: DataFrame, idCol: String, vecCol: String,
      cellCol: String, dropFrac: Double): DataFrame = {
    require(dropFrac >= 0.0 && dropFrac < 1.0,
      s"dropFrac must be in [0, 1), got $dropFrac")
    // one materialization feeds the centroid agg and the scoring probe
    val c = celled.select(col(idCol).as("id"), col(vecCol).as("v"),
      col(cellCol).as("cell")).localCheckpoint(false)
    val cent = cellCentroids(c, "v", "cell")
    // centroids: one row per cell, dim floats — broadcast by size
    val scoredRows = c.join(broadcast(cent), "cell")
      .withColumn("__proto", VectorFunctions.cosine_similarity(col("v"), col("cvec")))
    val w = Window.partitionBy("cell")
      .orderBy(col("__proto").desc, col("id"))
    val sizes = c.groupBy("cell").agg(count(lit(1)).as("n_cell"))
    scoredRows
      .withColumn("proto_rank", row_number().over(w).cast("long"))
      .join(broadcast(sizes), "cell")
      .filter(col("proto_rank") > ceil(lit(dropFrac) * col("n_cell")))
      .select(col("id"), col("cell"), col("n_cell"), col("proto_rank"))
  }

  /** The composed D4 recipe: [[Dedup.semDedup]] (cluster-bounded
    * semantic dedup, min-id survivor per near-dup component) then
    * [[prototypePrune]] over the SAME cells — dedup removes copies,
    * pruning removes templates. Returns the doubly-curated survivors
    * (id, cell, n_cell, proto_rank).
    */
  def d4Pipeline(df: DataFrame, idCol: String, vecCol: String,
      nClusters: Int, threshold: Double, dropFrac: Double,
      iters: Int = 3, dim: Int = 64, maxCell: Int = 8192): DataFrame = {
    val surv = Dedup.semDedup(df, idCol, vecCol, nClusters, threshold,
      iters, dim, maxCell)
    val withV = surv.join(
      df.select(col(idCol).as("id"), col(vecCol).as("v")), "id")
    prototypePrune(withV, "id", "v", "cell", dropFrac)
  }
}
