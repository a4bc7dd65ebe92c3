package graft

import org.apache.spark.sql.functions._
import graft.operators.{SqSearch, VectorSearch}

class SqSpec extends SparkSpec {

  private lazy val emb = Tables(spark, sf, "embeddings")
  private lazy val queries = emb.filter(col("vec_id") % 10 === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qv"))

  test("sq returns k matches per query, self-match first") {
    val model = SqSearch.trainModel(emb, "embedding", dim = 64)
    val got = SqSearch.sqTopK(queries, "qid", "qv", emb, "vec_id", "embedding",
      k = 3, model = model, metric = "dot", numCandidates = 100)
      .collect()
    val byQuery = got.groupBy(_.getLong(0))
    assert(byQuery.nonEmpty)
    byQuery.foreach { case (q, rows) =>
      assert(rows.length == 3, s"query $q should have 3 matches")
      // a vector quantizes within half a step of itself per dimension,
      // so its own code tops the scan and the exact re-rank confirms it
      val rank1 = rows.minBy(_.getInt(3))
      assert(rank1.getLong(1) == q, s"query $q rank1=${rank1.getLong(1)}")
    }
  }

  test("sq recall vs exact top-k is high (byte resolution, flat scan)") {
    val model = SqSearch.trainModel(emb, "embedding", dim = 64)
    val exact = VectorSearch.topKFlat(queries, "qid", "qv", emb, "vec_id",
        "embedding", k = 3, metric = "dot")
      .select("qid", "match_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SqSearch.sqTopK(queries, "qid", "qv", emb, "vec_id", "embedding",
        k = 3, model = model, metric = "dot", numCandidates = 100)
      .select("qid", "match_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    // SQ8 resolves each dim to 1/255 of its range — far finer than PQ's
    // 16 cells per 8-dim subspace — so flat-scan recall should be
    // near-exact, not merely "reasonable"
    assert(recall >= 0.9, s"recall $recall too low for SQ8")
  }

  test("training is deterministic across partitionings; encode round-trips bounds") {
    val a = SqSearch.trainModel(emb, "embedding", dim = 64)
    val b = SqSearch.trainModel(emb.repartition(7), "embedding", dim = 64)
    assert(a.lo.sameElements(b.lo) && a.hi.sameElements(b.hi))
    // corpus extremes encode to the range edges exactly
    val v = a.lo.clone()
    assert(SqSearch.encodeVec(a, v).forall(_ == 0))
    val hiCodes = SqSearch.encodeVec(a, a.hi.clone())
    hiCodes.indices.foreach { d =>
      // degenerate dims (hi == lo) encode 0 by contract; others saturate
      val want = if (a.hi(d) == a.lo(d)) 0 else 255
      assert((hiCodes(d) & 0xff) == want, s"dim $d: ${hiCodes(d) & 0xff}")
    }
    // out-of-bounds values clamp, never wrap
    val overCodes = SqSearch.encodeVec(a, a.hi.map(_ + 10f))
    overCodes.indices.foreach { d =>
      val want = if (a.hi(d) == a.lo(d)) 0 else 255
      assert((overCodes(d) & 0xff) == want)
    }
    val under = a.lo.map(_ - 10f)
    assert(SqSearch.encodeVec(a, under).forall(_ == 0))
  }

  test("save/load round-trips the model; shape derived from rows") {
    val m = SqSearch.trainModel(emb, "embedding", dim = 64)
    val dir = java.nio.file.Files.createTempDirectory("sq_model").toString
    SqSearch.saveModel(spark, s"$dir/m", m)
    val r = SqSearch.loadModel(spark, s"$dir/m")
    assert(r.dim == 64)
    assert(r.lo.sameElements(m.lo) && r.hi.sameElements(m.hi))
  }

  test("cachedModel trains once per tag (train-once/serve-many)") {
    val before = SqSearch.trainInvocations.get()
    val tag = s"sqspec_${System.nanoTime()}"
    val a = SqSearch.cachedModel(emb, "vec_id", "embedding", tag, persist = false)
    val mid = SqSearch.trainInvocations.get()
    assert(mid == before + 1)
    val b = SqSearch.cachedModel(emb, "vec_id", "embedding", tag, persist = false)
    assert(SqSearch.trainInvocations.get() == mid, "second lookup must not retrain")
    assert(a.lo.sameElements(b.lo))
  }

  test("coded corpus is bytes: dim bytes per vector at rest") {
    val m = SqSearch.trainModel(emb, "embedding", dim = 64)
    val coded = SqSearch.encode(emb, "vec_id", "embedding", m)
    assert(coded.schema("codes").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val row = coded.head()
    assert(row.getAs[Array[Byte]]("codes").length == 64)
  }

  test("l2 metric scans on dequantized distance and re-ranks exactly") {
    val model = SqSearch.trainModel(emb, "embedding", dim = 64)
    val got = SqSearch.sqTopK(queries.limit(5), "qid", "qv", emb, "vec_id",
      "embedding", k = 3, model = model, metric = "l2", numCandidates = 100)
      .collect()
    got.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val rank1 = rows.minBy(_.getInt(3))
      assert(rank1.getLong(1) == q, s"l2 self-match failed for query $q")
      assert(rank1.getDouble(2) == 0.0, "self L2 distance must be exactly 0")
    }
  }
}
