package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("id", "text")

  test("exact dedup keeps lowest id per normalized text") {
    val df = docs(
      1L -> "Hello  World", 2L -> "hello world", 3L -> "other doc",
      4L -> "  HELLO   WORLD  ")
    val kept = Dedup.exact(df, "id", "text").select("id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L))
  }

  test("exactScalable (hash-keyed) agrees with exact (text-keyed)") {
    val docs = Tables(spark, sf, "documents")
    val a = Dedup.exact(docs, "doc_id", "text").select("doc_id").as[Long].collect().sorted.toSeq
    val b = Dedup.exactScalable(docs, "doc_id", "text").select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("hll approx distinct within its declared error of exact") {
    val li = Tables(spark, sf, "lineitem")
    val exact = li.select(countDistinct(col("l_partkey"))).head().getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"), 0.02)).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("minhash finds planted near-duplicate, skips unrelated") {
    val base = (1 to 60).map(i => s"token$i").mkString(" ")
    val nearDup = (1 to 58).map(i => s"token$i").mkString(" ") + " tokenX tokenY"
    val other = (100 to 160).map(i => s"w$i").mkString(" ")
    val pairs = Dedup.minhashPairs(
      docs(1L -> base, 2L -> nearDup, 3L -> other), "id", "text",
      numHashes = 64, bands = 16, shingleLen = 5, threshold = 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("minhash pairs work with non-numeric ids (generic relational path)") {
    val base = (1 to 60).map(i => s"token$i").mkString(" ")
    val nearDup = (1 to 58).map(i => s"token$i").mkString(" ") + " tokenX tokenY"
    val other = (100 to 160).map(i => s"w$i").mkString(" ")
    val df = Seq(("doc-a", base), ("doc-b", nearDup), ("doc-c", other))
      .toDF("id", "text")
    val pairs = Dedup.minhashPairs(df, "id", "text",
      numHashes = 64, bands = 16, shingleLen = 5, threshold = 0.5)
      .select("id1", "id2").as[(String, String)].collect().toSet
    assert(pairs == Set(("doc-a", "doc-b")))
  }

  test("simhash finds planted near-duplicate within maxDist") {
    val base = (1 to 60).map(i => s"token$i").mkString(" ")
    val nearDup = base + " extra"
    val other = (100 to 160).map(i => s"w$i").mkString(" ")
    val pairs = Dedup.simhashPairs(
      docs(1L -> base, 2L -> nearDup, 3L -> other), "id", "text", maxDist = 8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("ngram jaccard matches brute force on a small corpus") {
    val corpus = Seq(
      1L -> "a b c d e f g",
      2L -> "a b c d e f x",
      3L -> "z y x w v u t",
      4L -> "a b c q r s t")
    def grams(s: String) = s.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val expected = (for {
      (i, ti) <- corpus; (j, tj) <- corpus if i < j
      gi = grams(ti); gj = grams(tj)
      jac = gi.intersect(gj).size.toDouble / gi.union(gj).size.toDouble
      if jac >= 0.2
    } yield (i, j)).toSet
    val got = Dedup.ngramJaccardPairs(docs(corpus: _*), "id", "text", n = 3, threshold = 0.2)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("dedup pipeline removes exact and minhash near-dups, keeps low ids") {
    val base = (1 to 60).map(i => s"token$i").mkString(" ")
    val df = docs(
      1L -> base,
      2L -> base.toUpperCase,                                     // exact dup of 1
      3L -> ((1 to 58).map(i => s"token$i").mkString(" ") + " x y"), // near-dup of 1
      4L -> (100 to 160).map(i => s"w$i").mkString(" "))          // unrelated
    val kept = Dedup.dedupPipeline(df, "id", "text", minhashThreshold = 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 4L))
  }

  test("streaming dedup drops re-delivered events (equals batch distinct)") {
    import org.apache.spark.sql.streaming.Trigger
    val events = Tables(spark, sf, "events").limit(200)
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_stream").toString
    // the same file twice = an exactly-once failure/retry re-delivery
    events.coalesce(1).write.parquet(s"$dir/a")
    events.coalesce(1).write.parquet(s"$dir/b")
    val stream = graft.streaming.Streams.dedupStream(
      spark.readStream.schema(events.schema).parquet(s"$dir/*"), "event_id")
    val q = stream.writeStream
      .format("memory").queryName("dedup_stream_test").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.table("dedup_stream_test").select("event_id").distinct().count() ==
      events.count())
    assert(spark.table("dedup_stream_test").count() == events.count())
  }

  test("clusterLabels reaches the transitive closure (chains and vees)") {
    // chain 1~2~3 with 1≁3: every member must label to the minimum
    val chain = Seq((2L, 3L), (1L, 2L)).toDF("id1", "id2")
    assert(Dedup.clusterLabels(chain).as[(Long, Long)].collect().toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // the single-round failure shape: (1,3),(2,3) — 2's only path to the
    // minimum is through 3
    val vee = Seq((1L, 3L), (2L, 3L)).toDF("id1", "id2")
    assert(Dedup.clusterLabels(vee).as[(Long, Long)].collect().toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // a long chain needs multiple propagation rounds; disjoint clusters
    // stay disjoint
    val long = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L), (11L, 12L)).toDF("id1", "id2")
    assert(Dedup.clusterLabels(long).as[(Long, Long)].collect().toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> 1L,
        10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("clusterLabels surfaces non-convergence instead of truncating") {
    // a 6-link chain needs 5 propagation rounds; maxRounds=3 must throw,
    // not silently return an incomplete closure (maxDriverEdges=0 forces
    // the distributed path — the driver union-find has no round limit)
    val chain = (1L until 6L).map(i => (i, i + 1)).toDF("id1", "id2")
    intercept[IllegalStateException] {
      Dedup.clusterLabels(chain, maxRounds = 3, maxDriverEdges = 0).collect()
    }
  }

  test("driver union-find and distributed label propagation agree") {
    // two chains and a triangle, plus an isolated pair — min-of-component
    // labels must be identical on both paths
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (12L, 10L), (20L, 21L)).toDF("id1", "id2")
    def labels(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val driver = labels(Dedup.clusterLabels(edges))
    val dist = labels(Dedup.clusterLabels(edges, maxDriverEdges = 0))
    assert(driver == dist)
    assert(driver == Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 10L), (11L, 10L), (12L, 10L), (20L, 20L), (21L, 20L)))
  }

  test("dedup pipeline drops transitive near-dup chains (A~B~C, A≁C)") {
    // B overlaps A by 54/60 tokens and C by 54/60, but A and C share only
    // 48/60 — with the right threshold, pairs are (A,B),(B,C) without (A,C)
    val a = (1 to 60).map(i => s"token$i").mkString(" ")
    val b = (7 to 66).map(i => s"token$i").mkString(" ")
    val c = (13 to 72).map(i => s"token$i").mkString(" ")
    val other = (100 to 160).map(i => s"w$i").mkString(" ")
    val kept = Dedup.dedupPipeline(
      docs(1L -> a, 2L -> b, 3L -> c, 4L -> other), "id", "text",
      minhashThreshold = 0.6)
      .select("id").as[Long].collect().sorted.toSeq
    // regardless of whether (1,3) itself is a candidate pair, the
    // transitive closure keeps only the chain minimum
    assert(kept == Seq(1L, 4L))
  }

  test("embeddingNearDupPairsLsh: exact precision, high recall vs the exact twin") {
    val rnd = new scala.util.Random(42)
    def randVec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    def perturb(v: Array[Float]): Array[Float] =
      v.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
    // 12 planted near-dup triples + 150 unrelated vectors
    val planted = (0 until 12).flatMap { g =>
      val base = randVec()
      Seq((g * 3L, base), (g * 3L + 1, perturb(base)), (g * 3L + 2, perturb(base)))
    }
    val noise = (0 until 150).map(i => (1000L + i, randVec()))
    val emb = (planted ++ noise).toDF("vec_id", "embedding")
    val exactPairs = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.9)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val lshPairs = Dedup.embeddingNearDupPairsLsh(emb, "vec_id", "embedding", 0.9,
      nBits = 8, nTables = 8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(exactPairs.size >= 12) // the plant worked
    // precision 1: candidates are exact-scored with the same threshold
    assert(lshPairs.subsetOf(exactPairs))
    // recall: multi-table LSH must find nearly all true pairs
    val recall = lshPairs.size.toDouble / exactPairs.size
    assert(recall >= 0.8, s"recall=$recall (${lshPairs.size}/${exactPairs.size})")
  }

  test("charShingleJaccardPairs matches brute force on a small corpus") {
    val a = "the quick brown fox jumps over the lazy dog"
    val b = "the quick brown fox jumps over the lazy cat" // near-dup of a
    val c = "completely different content here entirely"
    val df = docs(1L -> a, 2L -> b, 3L -> c)
    def shingles(s: String): Set[String] = {
      val nm = s.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).mkString(" ")
      (0 to nm.length - 5).map(i => nm.substring(i, i + 5)).toSet
    }
    def jac(x: String, y: String): Double = {
      val (sx, sy) = (shingles(x), shingles(y))
      sx.intersect(sy).size.toDouble / sx.union(sy).size
    }
    val got = Dedup.charShingleJaccardPairs(df, "id", "text", 5, 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val want = Seq((1L, 2L) -> jac(a, b), (1L, 3L) -> jac(a, c), (2L, 3L) -> jac(b, c))
      .filter(_._2 >= 0.3).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, v) => assert(math.abs(got(k) - v) < 1e-12, s"$k") }
  }

  test("bitset shingle jaccard is bit-identical to the relational form") {
    // real corpus (sf0.001 documents) at a loose threshold: the bitset
    // all-pairs path must reproduce the equi-join path's pair set AND its
    // IEEE-double jaccard values exactly (same integer counts, same
    // division), since it replaces the join as the contracts' shared
    // ground truth
    val documents = Tables(spark, sf, "documents")
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val rel = keyed(Dedup.charShingleJaccardPairs(documents, "doc_id", "text", 5, 0.2))
    val bit = keyed(Dedup.charShingleJaccardPairsBitset(documents, "doc_id", "text", 5, 0.2))
    assert(bit.keySet == rel.keySet)
    rel.foreach { case (k, v) => assert(bit(k) == v, s"pair $k: ${bit(k)} != $v") }
    assert(rel.nonEmpty) // the comparison actually exercised pairs
  }

  test("bitset shingle jaccard falls back to relational when vocab exceeds cap") {
    val df = docs(1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy cat",
      3L -> "completely different content here entirely")
    val capped = Dedup.charShingleJaccardPairsBitset(df, "id", "text", 5, 0.3,
      maxVocab = 4) // forces the fallback branch
    val rel = Dedup.charShingleJaccardPairs(df, "id", "text", 5, 0.3)
    assert(capped.collect().toSet == rel.collect().toSet)
  }

  test("charShingle ground truth vs minhash estimate: planted dup agrees") {
    val base = (1 to 60).map(i => s"token$i").mkString(" ")
    val nearDup = (1 to 58).map(i => s"token$i").mkString(" ") + " tokenX tokenY"
    val other = (100 to 160).map(i => s"w$i").mkString(" ")
    val df = docs(1L -> base, 2L -> nearDup, 3L -> other)
    val exact = Dedup.charShingleJaccardPairs(df, "id", "text", 5, 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val mh = Dedup.minhashPairs(df, "id", "text", 64, 16, 5, 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(exact == Set((1L, 2L)))
    assert(mh == exact, "minhash candidate set should equal ground truth here")
  }

  test("boilerplateLinesSketch equals the exact mine; vacuous guarantee fails loudly") {
    // planted: one boilerplate line across 40 docs, one across 3, and a
    // long tail of unique lines (the distinct-line mass the sketch
    // exists to keep out of memory); within-doc repetition must not
    // inflate doc-frequency
    val docs = (1L to 40L).map { i =>
      val boiler = if (i <= 40) "subscribe to our newsletter\n" else ""
      val rare = if (i <= 3) "cookie policy applies\ncookie policy applies\n" else ""
      (i, s"${boiler}${rare}unique line $i alpha\nunique line $i beta")
    }.toDF("id", "text")
    val exact = Dedup.boilerplateLines(docs, "id", "text", minDocFreq = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sketched = Dedup.boilerplateLinesSketch(docs, "id", "text",
        minDocFreq = 3, maxMapSize = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketched == exact && exact.nonEmpty, s"sketch $sketched vs $exact")
    assert(exact("cookie policy applies") == 3L,
      "within-doc repetition inflated doc frequency")
    // the no-false-negative guarantee must never fail SILENTLY: a map
    // too small for the stream errors instead of under-mining
    val wide = (1L to 2000L).map(i => (i, s"u$i a\nu$i b\nu$i c")).toDF("id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.boilerplateLinesSketch(wide, "id", "text", minDocFreq = 2,
        maxMapSize = 8)
    }
    assert(e.getMessage.contains("raise maxMapSize"), e.getMessage)
    // ...and on the real corpus the sketch path is byte-equal too
    val corpus = Tables(spark, sf, "documents")
    val exactC = Dedup.boilerplateLines(corpus, "doc_id", "text", 2)
      .collect().map(_.toString).sorted.toSeq
    val sketchC = Dedup.boilerplateLinesSketch(corpus, "doc_id", "text", 2)
      .collect().map(_.toString).sorted.toSeq
    assert(sketchC == exactC)
  }

  test("exactKeepBest keeps the best-quality copy, not the lowest id") {
    val df = Seq(
      (1L, "hello   world", 0.4), // messy copy, low quality
      (2L, "Hello World", 0.9),   // clean copy of the same content
      (3L, "other doc", 0.5)
    ).toDF("id", "text", "q")
    val kept = Dedup.exactKeepBest(df, "id", "text", "q")
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L, 3L))
    // quality tie falls back to lowest id
    val tied = Seq((5L, "same", 0.7), (4L, "SAME", 0.7)).toDF("id", "text", "q")
    assert(Dedup.exactKeepBest(tied, "id", "text", "q")
      .select("id").as[Long].head() == 4L)
    // NULLS LAST: an unscored copy never beats a scored one, even with a
    // lower id (the window form's `quality DESC` put nulls last; the
    // min-struct form must match — a bare -quality would flip this)
    val withNull = Seq(
      (1L, "dup text", None),          // null quality, lowest id
      (2L, "Dup  Text", Some(0.1)),    // scored — must win its group
      (7L, "only nulls", None),
      (8L, "ONLY  nulls", None)        // all-null group: lowest id wins
    ).toDF("id", "text", "q")
    assert(Dedup.exactKeepBest(withNull, "id", "text", "q")
      .select("id").as[Long].collect().sorted.toSeq == Seq(2L, 7L))
  }

  test("keepBest pipeline keeps one best-quality doc per near-dup cluster") {
    // planted: 1~2~3 form a minhash near-dup chain, 9 is isolated
    val base = (1 to 60).map(i => s"token$i").mkString(" ")
    val variant = (1 to 58).map(i => s"token$i").mkString(" ") + " tokenX tokenY"
    val variant2 = (3 to 60).map(i => s"token$i").mkString(" ") + " tokenZ"
    val other = (100 to 160).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, base, 0.5), (2L, variant, 0.9), (3L, variant2, 0.7), (9L, other, 0.1)
    ).toDF("id", "text", "q")
    val kept = Dedup.dedupPipelineKeepBest(df, "id", "text", "q", minhashThreshold = 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    // cluster {1,2,3} -> highest quality (2) survives; isolated 9 survives
    assert(kept == Seq(2L, 9L))
    // same cluster structure as the min-id pipeline: equal survivor count
    val minKept = Dedup.dedupPipeline(df, "id", "text", minhashThreshold = 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(minKept == Seq(1L, 9L))
    assert(kept.size == minKept.size)
  }

  test("keepBest pipeline equals min-id pipeline count on the real corpus") {
    val docs = Tables(spark, sf, "documents")
      .withColumn("q", graft.functions.TextOps.qualityScore(col("text")))
    val best = Dedup.dedupPipelineKeepBest(docs, "doc_id", "text", "q").count()
    val minId = Dedup.dedupPipeline(docs, "doc_id", "text").count()
    assert(best == minId)
  }

  test("embedding near-dup pairs symmetric corpus sanity") {
    val emb = Tables(spark, sf, "embeddings")
    val pairs = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", threshold = 0.99)
      .collect()
    // id1 < id2 always; cosine within [-1, 1]
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(math.abs(r.getDouble(2)) <= 1.0)
    }
  }

  test("duplicateSpans finds cross-doc 8-token windows; hashed form agrees") {
    val shared = (1 to 12).map(i => s"tok$i").mkString(" ")
    val df = docs(
      1L -> s"$shared and unique tail one",
      2L -> s"prefix words here $shared",
      3L -> "an entirely different document with no shared span at all yes")
    val spans = Dedup.duplicateSpans(df, "id", "text", n = 8, minDocs = 2)
      .select("id", "pos", "n_docs").as[(Long, Int, Long)].collect().sorted.toSeq
    // 12 shared tokens -> 5 duplicated 8-windows per doc, offset by prefix
    assert(spans.count(_._1 == 1L) == 5)
    assert(spans.count(_._1 == 2L) == 5)
    assert(spans.count(_._1 == 3L) == 0)
    assert(spans.filter(_._1 == 1L).map(_._2) == Seq(1, 2, 3, 4, 5))
    assert(spans.filter(_._1 == 2L).map(_._2) == Seq(4, 5, 6, 7, 8))
    assert(spans.forall(_._3 == 2L))
    val hashed = Dedup.duplicateSpansHashed(df, "id", "text", n = 8, minDocs = 2)
      .select("id", "pos", "n_docs").as[(Long, Int, Long)].collect().sorted.toSeq
    assert(hashed == spans)
  }

  test("removeDuplicateSpans scrubs covered tokens from non-keepers only") {
    val shared = (1 to 12).map(i => s"tok$i").mkString(" ")
    val df = docs(
      1L -> s"$shared and unique tail one",
      2L -> s"prefix words here $shared",
      3L -> "an entirely different document with no shared span at all yes")
    val out = Dedup.removeDuplicateSpans(df, "id", "text", n = 8, minDocs = 2)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 1 is keeper of every duplicated window — untouched
    assert(out(1L) == ((16L, 0L, s"$shared and unique tail one")))
    // doc 2: the 5 duplicated windows cover token positions 4..15 —
    // overlapping coverage merges, the un-shared prefix survives
    assert(out(2L) == ((15L, 12L, "prefix words here")))
    assert(out(3L)._2 == 0L)
    // a fully-covered doc stays in the output with empty text
    val all = docs(1L -> "a b c d e f g h", 2L -> "a b c d e f g h")
    val scrubbed = Dedup.removeDuplicateSpans(all, "id", "text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(scrubbed(1L) == ((8L, 0L, "a b c d e f g h")))
    assert(scrubbed(2L) == ((8L, 8L, "")))
  }

  test("semDedup removes only docs with an exact >=threshold neighbor and keeps isolated docs") {
    val emb = Tables(spark, sf, "embeddings")
    val surv = Dedup.semDedup(emb, "vec_id", "embedding",
      nClusters = 16, threshold = 0.35)
    val kept = surv.select("id").as[Long].collect().toSet
    val all = emb.select("vec_id").as[Long].collect().toSet
    val removed = all -- kept
    val exactPairs = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.35)
      .select("id1", "id2").as[(Long, Long)].collect()
    val paired = exactPairs.flatMap(p => Seq(p._1, p._2)).toSet
    // every removed doc has a true >=0.35 neighbor; isolated docs all kept
    assert(removed.subsetOf(paired), "removed a doc with no exact neighbor")
    assert((all -- paired).subsetOf(kept), "dropped an isolated doc")
    assert(removed.nonEmpty, "semDedup removed nothing on a corpus with near-dups")
  }

  test("lineDedup keeps min-id copy of shared lines, blanks, and order") {
    val docs = Seq(
      (3L, "shared boilerplate\nunique three\n\nalso shared"),
      (1L, "Shared Boilerplate\nunique one"),
      (2L, "shared boilerplate\nunique two\nalso shared")).toDF("id", "text")
    val out = Dedup.lineDedup(docs, "id", "text", minDocs = 2)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 1 is the min-id keeper of "shared boilerplate" (case-folded);
    // "also shared" keeps doc 2's copy; blank lines always survive
    assert(out(1L) == ((2L, 2L, "Shared Boilerplate\nunique one")))
    assert(out(2L) == ((3L, 2L, "unique two\nalso shared")))
    assert(out(3L) == ((4L, 2L, "unique three\n")))
    // a doc that is pure boilerplate disappears
    val all = Seq((1L, "dup line"), (2L, "dup line"), (3L, "dup line"))
      .toDF("id", "text")
    assert(Dedup.lineDedup(all, "id", "text").select("id")
      .as[Long].collect().toSeq == Seq(1L))
  }

  test("semDedup with a tight maxCell still satisfies the dedup contract") {
    // recursive re-cluster changes candidate generation, never the
    // guarantees: survivors at a tight cap must still satisfy the
    // isolated-kept / removed-has-neighbor contract
    val emb = Tables(spark, sf, "embeddings")
    val capped = Dedup.semDedup(emb, "vec_id", "embedding",
      nClusters = 16, threshold = 0.35, maxCell = 16)
    val keptCapped = capped.select("id").as[Long].collect().toSet
    val all = emb.select("vec_id").as[Long].collect().toSet
    val exactPairs = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.35)
      .select("id1", "id2").as[(Long, Long)].collect()
    val paired = exactPairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert((all -- keptCapped).subsetOf(paired), "removed a doc with no exact neighbor")
    assert((all -- paired).subsetOf(keptCapped), "dropped an isolated doc")
    // cap actually bit: with 500 vectors over 16 cells, average cell
    // size is ~31 > 16, so at least one re-cluster round ran — cells
    // from later rounds carry labels >= nClusters
    assert(capped.select("cell").as[Int].collect().exists(_ >= 16),
      "tight maxCell never triggered a re-cluster round")
  }

  test("suggestedClusters: the nClusters scaling rule is executable, not prose") {
    // ceil(n / targetCell), clamped to [1, 2^20] — the semDedup scaladoc's
    // "nClusters grows with the corpus" as an assertable formula
    assert(Dedup.suggestedClusters(0L) == 1)
    assert(Dedup.suggestedClusters(1L) == 1)
    assert(Dedup.suggestedClusters(2048L) == 1)
    assert(Dedup.suggestedClusters(2049L) == 2)
    assert(Dedup.suggestedClusters(1000000000L) == 488282)
    assert(Dedup.suggestedClusters(Long.MaxValue) == (1 << 20))
    assert(Dedup.suggestedClusters(100L, targetCell = 10) == 10)
    // the invariant the rule exists for: below the clamp, the MEAN cell
    // never exceeds targetCell, so the maxCell hard cap (4x the default
    // target) only fires on genuinely dense regions
    for (n <- Seq(1L, 999L, 2048L, 50000L, 123456789L)) {
      val k = Dedup.suggestedClusters(n)
      assert(n <= k.toLong * 2048, s"mean cell over target at n=$n, k=$k")
    }
  }

  test("boilerplateLines mines doc-frequent lines; stopLineFilter removes them everywhere") {
    val docs = Seq(
      (1L, "All Rights Reserved\nreal content one\nsubscribe now"),
      (2L, "all rights reserved\nreal content two"),
      (3L, "ALL RIGHTS RESERVED\n\nreal content three\nsubscribe now"),
      (4L, "subscribe now")).toDF("id", "text")
    val mined = Dedup.boilerplateLines(docs, "id", "text", minDocFreq = 3)
      .as[(String, Long)].collect().toMap
    assert(mined == Map("all rights reserved" -> 3L, "subscribe now" -> 3L))
    val out = Dedup.stopLineFilter(docs, "id", "text",
        Dedup.boilerplateLines(docs, "id", "text", minDocFreq = 3).select("key"))
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // no keeper copy: the stop line vanishes from every doc, case-folded
    assert(out(1L) == ((3L, 1L, "real content one")))
    assert(out(2L) == ((2L, 1L, "real content two")))
    assert(out(3L) == ((4L, 2L, "\nreal content three")))
    // a doc that is pure boilerplate disappears
    assert(!out.contains(4L))
  }

  test("winnowing: matching guarantee, density bound, and selection laws") {
    import spark.implicits._
    val k = 5; val w = 4
    // two docs share a long substring (>= w + k - 1 = 8 normalized
    // chars) embedded in different contexts; a third is unrelated
    val shared = "thequickbrownfoxjumps"
    val docs = Seq(
      (1L, s"AAA $shared zz"),
      (2L, s"completely other prefix $shared and suffix"),
      (3L, "nothing in common here at all xyz")).toDF("id", "text")
    val fp = graft.operators.Dedup.winnow(docs, "id", "text", k, w)
      .as[(Long, Long, String)].collect()
    val byDoc = fp.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    // matching guarantee: docs 1 and 2 share >= 1 fingerprint GRAM
    assert(byDoc(1L).intersect(byDoc(2L)).nonEmpty,
      "shared substring must yield a shared fingerprint")
    // density: consecutive selected positions gap by <= w
    fp.groupBy(_._1).foreach { case (id, rows) =>
      val ps = rows.map(_._2).sorted
      ps.zip(ps.tail).foreach { case (a, b) =>
        assert(b - a <= w, s"doc $id: fingerprint gap ${b - a} > $w")
      }
    }
    // every fingerprint is a real gram of the normalized stream at its
    // claimed position
    val norm = docs.as[(Long, String)].collect()
      .map { case (id, t) => id -> t.toLowerCase.replaceAll("[^a-z0-9]", "") }
      .toMap
    fp.foreach { case (id, pos, gram) =>
      assert(norm(id).substring(pos.toInt - 1, pos.toInt - 1 + k) == gram,
        s"doc $id pos $pos: $gram not at that position")
    }
    // short docs (< k + w - 1 normalized chars) yield nothing, no error
    val short = Seq((9L, "ab c")).toDF("id", "text")
    assert(graft.operators.Dedup.winnow(short, "id", "text", k, w).count() == 0)
  }

  test("winnowPairs: shared-substring docs pair; hot grams bucket-capped") {
    import spark.implicits._
    val shared = "uniquesharedrunofcharacters"
    val boiler = "commonboilerplateeverywhere"
    // docs 1/2 share a rare run; 3..8 all share only the boilerplate
    val docs = (Seq(
      (1L, s"first $shared tail"),
      (2L, s"other prefix $shared")) ++
      (3L to 8L).map(i => (i, s"doc number $i with $boiler"))
    ).toDF("id", "text")
    val pairs = graft.operators.Dedup.winnowPairs(docs, "id", "text",
        k = 5, w = 4, minShared = 2, maxBucket = 4)
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2)).toSet
    assert(pairs.contains((1L, 2L)), s"rare shared run must pair: $pairs")
    // every gram shared among docs 3..8 (the boilerplate and the "doc
    // number" prefix) is held by all six of them — bucket 6 > maxBucket
    // 4, so all are dropped and boilerplate-only docs never pair
    val boilerPairs = pairs.filter { case (a, b) => a >= 3 && b >= 3 }
    assert(boilerPairs.isEmpty, s"capped grams still paired: $boilerPairs")
  }
}
