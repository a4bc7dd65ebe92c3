package graft

import org.apache.spark.sql.functions._
import graft.functions.TopKHeap
import graft.operators.VectorSearch

class VectorSearchSpec extends SparkSpec {
  import VectorSearch._

  private lazy val emb = Tables(spark, sf, "embeddings")
  private lazy val queries =
    emb.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("embedding").as("qv"))

  private def flat(metric: String, k: Int) =
    topKFlat(queries, "qid", "qv", emb, "vec_id", "embedding", k, metric)
      .select("qid", "match_id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def fromMatches(df: org.apache.spark.sql.DataFrame) =
    df.select(col("qid"), explode(col("matches")).as("m"))
      .select(col("qid"), col("m.id"), col("m.score")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("all three strategies return identical top-k (dot)") {
    val f = flat("dot", 3)
    val a = fromMatches(topKAgg(queries, "qid", "qv", emb, "vec_id", "embedding", 3, "dot"))
    val b = fromMatches(topKBroadcast(queries, "qid", "qv", emb, "vec_id", "embedding", 3, "dot"))
    assert(f == a)
    assert(f == b)
    assert(f.nonEmpty)
  }

  test("strategies agree for cosine and l2 too") {
    for (m <- Seq("cosine", "l2")) {
      val f = flat(m, 4)
      val a = fromMatches(topKAgg(queries, "qid", "qv", emb, "vec_id", "embedding", 4, m))
      val b = fromMatches(topKBroadcast(queries, "qid", "qv", emb, "vec_id", "embedding", 4, m))
      assert(f == a, s"agg mismatch for $m")
      assert(f == b, s"broadcast mismatch for $m")
    }
  }

  test("self-match ranks first under dot for normalized-ish vectors") {
    val top1 = topKFlat(queries, "qid", "qv", emb, "vec_id", "embedding", 1, "cosine")
      .select("qid", "match_id").collect()
    top1.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("topK(k) is a prefix of topK(k+1)") {
    val k3 = topKFlat(queries, "qid", "qv", emb, "vec_id", "embedding", 3, "dot")
      .select("qid", "match_id", "rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val k5 = topKFlat(queries, "qid", "qv", emb, "vec_id", "embedding", 5, "dot")
      .select("qid", "match_id", "rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(k3.subsetOf(k5))
  }

  test("annTopK candidates are a subset of exact scores and include self") {
    val ann = annTopK(queries, "qid", "qv", emb, "vec_id", "embedding", 3, "dot")
      .select("qid", "match_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ann.nonEmpty)
    // every query collides with itself in every LSH table -> rank-1 self pair exists
    val self = ann.filter { case (q, m) => q == m }
    assert(self.length == queries.count())
  }

  test("TopKHeap keeps best k with deterministic tie-break") {
    val h = new TopKHeap(3, ascending = false)
    h.insert(1, 0.5); h.insert(2, 0.9); h.insert(3, 0.5)
    h.insert(4, 0.1); h.insert(5, 0.9)
    // expect (2,0.9),(5,0.9) id-tiebreak asc, then (1,0.5)
    assert(h.n == 3)
    assert((h.ids(0), h.scores(0)) == (2L, 0.9))
    assert((h.ids(1), h.scores(1)) == (5L, 0.9))
    assert((h.ids(2), h.scores(2)) == (1L, 0.5))
  }

  test("property: TopKHeap == sort-based top-k on random input") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val n = 1 + rnd.nextInt(50)
      val k = 1 + rnd.nextInt(8)
      val xs = Array.fill(n)((rnd.nextInt(20).toLong, (rnd.nextInt(5) / 4.0)))
      val h = new TopKHeap(k, ascending = false)
      xs.foreach { case (id, s) => h.insert(id, s) }
      val sorted = xs.toSeq.sortBy { case (id, s) => (-s, id) }.take(k)
      val got = (0 until h.n).map(i => (h.ids(i), h.scores(i)))
      assert(got == sorted, s"n=$n k=$k")
    }
  }

  test("property: heap merge == concatenated insert") {
    val rnd = new scala.util.Random(11)
    (1 to 100).foreach { _ =>
      val a = Array.fill(rnd.nextInt(30))((rnd.nextInt(100).toLong, rnd.nextDouble()))
      val b = Array.fill(rnd.nextInt(30))((rnd.nextInt(100).toLong, rnd.nextDouble()))
      val k = 1 + rnd.nextInt(5)
      val h1 = new TopKHeap(k, false); a.foreach { case (i, s) => h1.insert(i, s) }
      val h2 = new TopKHeap(k, false); b.foreach { case (i, s) => h2.insert(i, s) }
      h1.mergeIn(h2)
      val h3 = new TopKHeap(k, false); (a ++ b).foreach { case (i, s) => h3.insert(i, s) }
      assert((0 until h1.n).map(i => (h1.ids(i), h1.scores(i))) ==
        (0 until h3.n).map(i => (h3.ids(i), h3.scores(i))))
    }
  }

  test("scoreF32 matches the Catalyst expressions bit-for-bit") {
    val rows = emb.limit(20).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val df = emb.limit(20).select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(emb.limit(20).select(col("vec_id").as("b_id"), col("embedding").as("b")))
    for (m <- Seq("dot", "cosine", "l2")) {
      val got = df.withColumn("s", scoreCol(m)(col("a"), col("b")))
        .select("a_id", "b_id", "s").collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      val lookup = rows.toMap
      got.foreach { case ((i, j), s) =>
        assert(s == scoreF32(m, lookup(i), lookup(j)), s"metric=$m pair=($i,$j)")
      }
    }
  }

  test("groupMaxSimTopK: a group ranks by its BEST member (late interaction)") {
    import spark.implicits._
    // group 10 holds a far vector AND a near-identical one; group 20
    // holds two mediocre vectors. MaxSim must rank group 10 first even
    // though its MEAN is worse.
    val corpus = Seq(
      (1L, 10L, Array(-1.0f, 0.0f)),  // group 10: terrible member
      (2L, 10L, Array(0.99f, 0.14f)), // group 10: near-perfect member
      (3L, 20L, Array(0.7f, 0.7f)),
      (4L, 20L, Array(0.7f, 0.71f))).toDF("vid", "grp", "vec")
    val q = Seq((0L, Array(1.0f, 0.0f))).toDF("query_id", "qv")
    val got = graft.operators.VectorSearch.groupMaxSimTopK(
        q, "query_id", "qv", corpus, "grp", "vec", k = 2)
      .as[(Long, Long, Int)].collect().sortBy(_._3)
    assert(got.map(_._2).toSeq == Seq(10L, 20L), got.toSeq)
    // l2 flips to min (closest member)
    val l2 = graft.operators.VectorSearch.groupMaxSimTopK(
        q, "query_id", "qv", corpus, "grp", "vec", k = 2, metric = "l2")
      .as[(Long, Long, Int)].collect().sortBy(_._3)
    assert(l2.map(_._2).toSeq == Seq(10L, 20L), l2.toSeq)
  }

  test("groupMaxSimAnn recalls the exact top group under the candidate budget") {
    import spark.implicits._
    val emb = Tables(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val approx = graft.operators.VectorSearch.groupMaxSimAnn(
        q, "query_id", "qv", emb, "label", "vec_id", "embedding",
        k = 3, numCandidates = 200)
      .as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = graft.operators.VectorSearch.groupMaxSimTopK(
        q, "query_id", "qv", emb, "label", "embedding", k = 1)
      .as[(Long, Long, Int)].collect()
    assert(exact.nonEmpty)
    exact.foreach { case (qid, top, _) =>
      assert(approx(qid).contains(top),
        s"query $qid: exact top group $top missed by the probed path")
    }
  }

  test("groupMaxSimIndex: persisted-probe MaxSim recalls the exact top group") {
    import spark.implicits._
    val emb = Tables(spark, sf, "embeddings")
    val path = java.nio.file.Files.createTempDirectory("graft_maxsim_idx").toString
    graft.operators.IvfSearch.writeIndex(emb, "vec_id", "embedding", path,
      nList = 8, iters = 2)
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val approx = graft.operators.VectorSearch.groupMaxSimIndex(
        spark, path, q, "query_id", "qv",
        emb.select("vec_id", "label"), "vec_id", "label",
        k = 3, metric = "cosine", numCandidates = 200, nProbe = 4)
      .as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = graft.operators.VectorSearch.groupMaxSimTopK(
        q, "query_id", "qv", emb, "label", "embedding", k = 1)
      .as[(Long, Long, Int)].collect()
    assert(exact.nonEmpty)
    exact.foreach { case (qid, top, _) =>
      assert(approx(qid).contains(top),
        s"query $qid: exact top group $top missed by the persisted probe")
    }
  }

  test("topKFiltered: exact filtered top-k — admitted matches only, " +
      "equals brute force over the admitted subset") {
    val pred = col("label") % 4 === 1
    val got = topKFiltered(queries, "qid", "qv", emb, "vec_id", "embedding",
        pred, k = 3, metric = "dot")
      .select("qid", "match_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = topKFlat(queries, "qid", "qv", emb.filter(pred), "vec_id",
        "embedding", 3, "dot")
      .select("qid", "match_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want)
    assert(got.nonEmpty)
    // every returned id satisfies the predicate — pre-filter, never
    // "admitted among the unfiltered top-k"
    val admitted = emb.filter(pred).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    got.foreach { case (_, m, _) => assert(admitted(m)) }
    // and the filtered ladder can differ from post-filtering the
    // unfiltered one: each query still fills all 3 ranks
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3) == Set(1, 2, 3), s"query $q under-filled")
    }
  }

  test("radiusFlat: exactly the pairs within the threshold, self included") {
    import spark.implicits._
    val got = radiusFlat(queries, "qid", "qv", emb, "vec_id", "embedding",
        threshold = 0.3, metric = "cosine")
      .select("qid", "match_id").as[(Long, Long)].collect().toSet
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val qs = vecs.filter(_._1 < 10)
    val want = (for {
      (qid, qv) <- qs
      (cid, cv) <- vecs
      if scoreF32("cosine", qv, cv) >= 0.3
    } yield (qid, cid)).toSet
    assert(got == want)
    // the self pair (cosine 1.0) is always inside the ball
    qs.foreach { case (qid, _) => assert(got((qid, qid))) }
  }

  test("radiusLsh: precision 1.0 (subset of exact), self-pair always seen, " +
      "recall within the contract") {
    val exact = radiusFlat(queries, "qid", "qv", emb, "vec_id", "embedding",
        0.3, "cosine")
      .select("qid", "match_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = radiusLsh(queries, "qid", "qv", emb, "vec_id", "embedding",
        0.3, "cosine", nBits = 4, nTables = 24)
      .select("qid", "match_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact re-score of candidates => every emitted pair genuinely clears
    // the threshold
    assert(approx.subsetOf(exact))
    // identical vectors share every bucket, so the self pair cannot miss
    queries.select("qid").collect().map(_.getLong(0))
      .foreach(q => assert(approx((q, q))))
    // the per-query fraction contract the driver query gates on
    val ok = radiusRecallContract(
      radiusLsh(queries, "qid", "qv", emb, "vec_id", "embedding",
        0.3, "cosine", nBits = 4, nTables = 24),
      radiusFlat(queries, "qid", "qv", emb, "vec_id", "embedding",
        0.3, "cosine"),
      queries, "qid", "match_id", minFrac = 0.5).collect()
    assert(ok.nonEmpty)
    ok.foreach(r => assert(r.getBoolean(1), s"query ${r.getLong(0)} below 0.5 recall"))
  }

  test("radiusRecallContract: a query with an empty exact ball passes trivially") {
    import spark.implicits._
    val exact = Seq((1L, 10L), (1L, 11L)).toDF("qid", "match_id")
    val approx = Seq((1L, 10L)).toDF("qid", "match_id")
    val qs = Seq(Tuple1(1L), Tuple1(2L)).toDF("qid")
    val got = radiusRecallContract(approx, exact, qs, "qid", "match_id", 0.5)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(got(1L))   // 1 of 2 = exactly the 0.5 floor
    assert(got(2L))   // no exact matches -> trivially satisfied
    val strict = radiusRecallContract(approx, exact, qs, "qid", "match_id", 0.75)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(!strict(1L)) // 0.5 < 0.75 -> gated
  }

  test("groupMaxSimTopK matches a brute-force group max on the sf corpus") {
    import spark.implicits._
    val emb = Tables(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val got = graft.operators.VectorSearch.groupMaxSimTopK(
        q, "query_id", "qv", emb, "label", "embedding", k = 3)
      .as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    val vecs = emb.select(col("vec_id"), col("label").cast("long"), col("embedding"))
      .as[(Long, Long, Array[Float])].collect()
    val queries = vecs.filter(_._1 % 100 == 0)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0f; var aa = 0.0f; var bb = 0.0f
      a.indices.foreach { i => d += a(i)*b(i); aa += a(i)*a(i); bb += b(i)*b(i) }
      (d / (math.sqrt(aa).toFloat * math.sqrt(bb).toFloat)).toDouble
    }
    queries.foreach { case (qid, _, qv) =>
      val best = vecs.groupBy(_._2).view
        .mapValues(_.map(v => cos(qv, v._3)).max).toMap
      val want = best.toSeq.sortBy { case (g, s) => (-s, g) }.take(3).map(_._1)
      assert(got(qid) == want, s"query $qid: ${got(qid)} != $want")
    }
  }
}
