package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Diversify}

/** D4-style diversification (anchor cells + prototypicality pruning +
  * the composed d4Pipeline) — invariants, determinism, and the
  * float-parity margin that keeps q_proto_prune's oracle gate immune to
  * cross-engine summation-order wobble.
  */
class DiversifySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables(spark, sf, "embeddings")

  private lazy val anchors = emb.orderBy("vec_id").limit(8)
    .select("vec_id", "embedding").collect()
    .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq

  test("anchorCells assigns every vector to an anchor id, deterministically") {
    val celled = Diversify.anchorCells(emb, "vec_id", "embedding", anchors)
    val n = emb.count()
    assert(celled.count() == n, "every vector gets a cell")
    val anchorIds = anchors.map(_._1).toSet
    val cells = celled.select("cell").distinct().as[Long].collect().toSet
    assert(cells.subsetOf(anchorIds), s"cells $cells must be anchor ids")
    // anchors are their own nearest anchor (self-cosine = 1.0 clamps max)
    val selfCells = celled.filter(col("id").isin(anchors.map(_._1): _*))
      .select("id", "cell").as[(Long, Long)].collect().toMap
    anchors.foreach { case (aid, _) =>
      assert(selfCells(aid) == aid, s"anchor $aid must sit in its own cell")
    }
    // two runs agree bit-for-bit (pure fold over literals, no randomness)
    val again = Diversify.anchorCells(emb, "vec_id", "embedding", anchors)
      .select("id", "cell").as[(Long, Long)].collect().toMap
    val first = celled.select("id", "cell").as[(Long, Long)].collect().toMap
    assert(first == again)
  }

  test("prototypePrune drops exactly ceil(dropFrac * n) per cell, most-prototypical first") {
    val celled = Diversify.anchorCells(emb, "vec_id", "embedding", anchors)
    val frac = 0.25
    val surv = Diversify.prototypePrune(celled, "id", "v", "cell", frac)
    val cellSizes = celled.groupBy("cell").count()
      .as[(Long, Long)].collect().toMap
    val kept = surv.groupBy("cell").agg(
      count(lit(1)).as("k"), min("proto_rank").as("minrk"),
      first("n_cell").as("nc"))
      .as[(Long, Long, Long, Long)].collect()
    assert(kept.map(_._1).toSet == cellSizes.keySet,
      "no cell vanishes at dropFrac 0.25")
    kept.foreach { case (cell, k, minrk, nc) =>
      val n = cellSizes(cell)
      assert(nc == n, s"n_cell must be the true cell size for $cell")
      val dropped = math.ceil(frac * n).toLong
      assert(k == n - dropped,
        s"cell $cell: kept $k of $n, expected ${n - dropped}")
      assert(minrk == dropped + 1,
        s"cell $cell: survivor ranks must start right after the drop cut")
    }
    // dropFrac = 0 keeps everything
    val all = Diversify.prototypePrune(celled, "id", "v", "cell", 0.0)
    assert(all.count() == emb.count())
  }

  test("centroid f32 quantization is summation-order-invariant (oracle-parity)") {
    // The q_proto_prune oracle gate depends on both engines quantizing
    // each per-(cell, dim) double mean to the SAME float. Engines are
    // free to sum a group in any order (per-partition partials +
    // combine), so the property that protects the gate is ORDER
    // INVARIANCE of the f32-quantized mean — asserted mechanically over
    // the classic orderings plus random shuffles, so corpus churn that
    // lands a mean on an order-sensitive f32 boundary fails HERE with a
    // named cause instead of surfacing as a mystery oracle hash
    // mismatch. (A midpoint-distance margin is the wrong guard: ~25% of
    // real means sit near midpoints, yet their double sums are exact —
    // bounded f32 groups usually sum without any rounding at all.)
    val celled = Diversify.anchorCells(emb, "vec_id", "embedding", anchors)
    val groups = celled
      .select(col("cell"), posexplode(col("v")).as(Seq("i", "x")))
      .as[(Long, Int, Float)].collect()
      .groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3)).toMap
    assert(groups.nonEmpty)
    val rnd = new scala.util.Random(42)
    def mean(order: Seq[Float]): Float = {
      var s = 0.0; order.foreach(s += _); (s / order.length).toFloat
    }
    def treeSum(a: Array[Double]): Double =
      if (a.length == 1) a(0)
      else treeSum(a.grouped(2).map(_.sum).toArray)
    groups.foreach { case (k, vs) =>
      val base = mean(vs.toSeq)
      val variants = Seq(vs.reverse.toSeq, vs.sorted.toSeq,
        vs.sorted(Ordering[Float].reverse).toSeq) ++
        (1 to 5).map(_ => rnd.shuffle(vs.toSeq))
      variants.foreach(v => assert(mean(v) == base,
        s"group $k: f32 mean flips under re-ordered summation"))
      assert((treeSum(vs.map(_.toDouble)) / vs.length).toFloat == base,
        s"group $k: f32 mean flips under pairwise-tree summation")
    }
  }

  test("d4Pipeline = semDedup survivors then per-cell prototype pruning") {
    val frac = 0.2
    val d4 = Diversify.d4Pipeline(emb, "vec_id", "embedding",
      nClusters = 8, threshold = 0.35, dropFrac = frac)
    val sem = Dedup.semDedup(emb, "vec_id", "embedding",
      nClusters = 8, threshold = 0.35)
    val semIds = sem.select("id").as[Long].collect().toSet
    // kmeans-path cell labels are Int — normalize to Long for the checks
    val d4Rows = d4.select(col("id"), col("cell").cast("long"),
      col("n_cell"), col("proto_rank"))
      .as[(Long, Long, Long, Long)].collect()
    assert(d4Rows.map(_._1).toSet.subsetOf(semIds),
      "D4 survivors are a subset of the semantic-dedup survivors")
    assert(d4Rows.nonEmpty && d4Rows.length < semIds.size,
      "pruning must actually drop prototypes")
    // the per-cell drop law holds on the deduped population too
    val semCellSizes = sem.groupBy(col("cell").cast("long").as("cell"))
      .count().as[(Long, Long)].collect().toMap
    d4Rows.groupBy(_._2).foreach { case (cell, rows) =>
      val n = semCellSizes(cell)
      assert(rows.length == n - math.ceil(frac * n).toLong,
        s"cell $cell: D4 kept ${rows.length} of $n")
    }
  }
}
