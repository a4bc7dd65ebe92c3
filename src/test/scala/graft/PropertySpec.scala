package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions.col

import graft.functions.{HashEmbedder, TextOps}
import graft.operators.Corpus

/** Property-style invariants over generated inputs (scalacheck Gen with
  * fixed seeds — deterministic across runs, no flaky tolerance rolls).
  * These pin the hash/sketch primitives' mathematical contracts, which
  * the oracle gate can't see (oracles check end-to-end values, not
  * distributional properties).
  */
class PropertySpec extends SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val wordGen: Gen[String] =
    Gen.listOfN(8, Gen.alphaLowerChar).map(_.mkString)

  private def docGen(n: Int): Gen[String] =
    Gen.listOfN(n, wordGen).map(_.mkString(" "))

  test("minhash estimate tracks true character-shingle jaccard") {
    // Broder '97: E[matching minhashes / numHashes] = true jaccard of the
    // shingle sets; with 64 hashes, |est - true| beyond 0.3 is > 4 sigma.
    for (seed <- 1L to 20L) {
      val base = sample(docGen(60), seed)
      val mutCount = (seed % 30).toInt
      val words = base.split(" ")
      val mutated = words.zipWithIndex.map { case (w, i) =>
        if (i < mutCount) sample(wordGen, seed * 1000 + i) else w
      }.mkString(" ")
      def shingles(s: String): Set[String] = {
        val norm = HashEmbedder.tokens(s).mkString(" ")
        (0 to norm.length - 5).map(i => norm.substring(i, i + 5)).toSet
      }
      val trueJ = {
        val (a, b) = (shingles(base), shingles(mutated))
        if (a.isEmpty && b.isEmpty) 1.0
        else a.intersect(b).size.toDouble / a.union(b).size
      }
      val sa = TextOps.minhashSignature(base, 64, 5)
      val sb = TextOps.minhashSignature(mutated, 64, 5)
      val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / 64
      assert(math.abs(est - trueJ) <= 0.3,
        s"seed=$seed est=$est true=$trueJ")
    }
  }

  test("identical text: minhash estimate 1, simhash distance 0, fingerprint equal") {
    for (seed <- 1L to 10L) {
      val doc = sample(docGen(40), seed)
      val doc2 = "  " + doc.replace(" ", "   ") + "  " // whitespace-insensitive
      assert(TextOps.minhashSignature(doc, 64, 5).toSeq ==
        TextOps.minhashSignature(doc2, 64, 5).toSeq)
      assert(java.lang.Long.bitCount(
        TextOps.simhash64(doc) ^ TextOps.simhash64(doc2)) == 0)
      assert(TextOps.fingerprint64(doc) == TextOps.fingerprint64(doc2))
    }
  }

  test("disjoint-vocabulary texts: simhash far apart, minhash estimate ~0") {
    for (seed <- 1L to 10L) {
      val a = sample(docGen(40), seed)
      val b = sample(docGen(40), seed + 100).toUpperCase.replace(' ', 'Q')
        .grouped(8).mkString(" ") // guaranteed-different token stream
      val ham = java.lang.Long.bitCount(TextOps.simhash64(a) ^ TextOps.simhash64(b))
      assert(ham > 10, s"seed=$seed hamming=$ham")
      val est = TextOps.minhashSignature(a, 64, 5)
        .zip(TextOps.minhashSignature(b, 64, 5))
        .count { case (x, y) => x == y }.toDouble / 64
      assert(est < 0.2, s"seed=$seed est=$est")
    }
  }

  test("sampleHash is uniform enough for rate-accurate sampling") {
    val n = 20000L
    val ids = (0L until n)
    def kept(rate: Double): Long = {
      val threshold = (rate * 4294967296d).toLong
      ids.count { id =>
        val h = java.lang.Math.floorMod(
          java.lang.Math.floorMod(id, 2147483648L) * 2654435761L, 4294967296L)
        h < threshold
      }
    }
    for (rate <- Seq(0.1, 0.25, 0.5, 0.75)) {
      val frac = kept(rate).toDouble / n
      assert(math.abs(frac - rate) < 0.02, s"rate=$rate got=$frac")
    }
  }

  test("latestByKey equals the window row_number form on random changelogs") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rowGen = for {
      k <- Gen.choose(0L, 9L)
      ord <- Gen.choose(0L, 49L)
      payload <- wordGen
    } yield (k, ord, payload)
    for (seed <- 1L to 5L) {
      val rows = sample(Gen.listOfN(200, rowGen), seed)
      // make (k, ord) unique so both forms are deterministic (the
      // documented contract: ordering must totally order within a key)
      val uniq = rows.zipWithIndex
        .map { case ((k, o, p), i) => (k, o * 1000 + i, p) }
      val df = uniq.toDF("k", "ord", "payload")
      val got = graft.operators.Compaction
        .latestByKey(df.repartition(7), Seq("k"), Seq("ord"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val w = Window.partitionBy("k").orderBy(col("ord").desc)
      val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("k", "ord", "payload")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(got == want, s"seed=$seed")
    }
  }

  test("bloom membership: zero false negatives over random member sets") {
    // Bloom 1970's one-sided guarantee, pinned over generated inputs:
    // EVERY inserted value probes true, at any fill factor — the property
    // decontamination's safety rests on (a missed member would leak an
    // eval item into training).
    import spark.implicits._
    import graft.operators.Bloom
    for (seed <- 1L to 10L) {
      val n = 50 + (seed * 37 % 400).toInt
      val members = sample(Gen.listOfN(n, wordGen), seed).distinct
      // deliberately undersized bits on some rounds (high FP regime):
      // false-negative freedom must hold even saturated
      val bits = if (seed % 3 == 0) 256L else 8192L
      val bloom = Bloom.build(members.toDF("g"), col("g"), n.toLong, bits)
      val hit = members.toDF("g")
        .filter(Bloom.mightContain(bloom, col("g"))).count()
      assert(hit == members.size,
        s"seed $seed: $hit/${members.size} members probe true (bits=$bits)")
    }
  }

  test("freq-items sketch: candidates are a superset of true heavy hitters") {
    // Misra-Gries' guarantee under NO_FALSE_NEGATIVES, pinned over
    // generated streams with planted heads and long random tails, across
    // partitionings (estimates vary with order; the superset must not)
    import spark.implicits._
    import graft.functions.FreqItemsSketch
    for (seed <- 1L to 5L) {
      val heads = (1L to 5L).map(h => Seq.fill(30 + h.toInt)(h)).flatten
      val tail = sample(Gen.listOfN(800, Gen.chooseNum(1000L, 999999L)), seed)
      val stream = new scala.util.Random(seed).shuffle(heads ++ tail)
      for (parts <- Seq(1, 7)) {
        val arr = stream.toDF("v").repartition(parts)
          .agg(FreqItemsSketch.freqItems(col("v"), 30L, 64).as("hh"))
          .head().getSeq[org.apache.spark.sql.Row](0)
        val sentinel = arr.last
        assert(sentinel.getLong(2) == stream.length, "stream length accounting")
        val cands = arr.init.map(_.getLong(0)).toSet
        val trueHeavy = stream.groupBy(identity).filter(_._2.size >= 30).keySet
        assert(trueHeavy.subsetOf(cands),
          s"seed $seed parts $parts: missed ${trueHeavy diff cands}")
        // estimates never undercount (upper bound >= estimate >= true)
        val trueCounts = stream.groupBy(identity).view.mapValues(_.size.toLong)
        arr.init.foreach { r =>
          val t = trueCounts.getOrElse(r.getLong(0), 0L)
          assert(r.getLong(1) >= t && r.getLong(3) >= t,
            s"estimate below true count for item ${r.getLong(0)}")
        }
      }
    }
  }

  test("embedder: unit norm, self-cosine 1, deterministic") {
    for (seed <- 1L to 10L) {
      val doc = sample(docGen(20), seed)
      val v = HashEmbedder.embed(doc, 64)
      val v2 = HashEmbedder.embed(doc, 64)
      assert(v.toSeq == v2.toSeq)
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-5, s"norm=$norm")
    }
    assert(HashEmbedder.embed("", 64).forall(_ == 0f), "empty text -> zero vector")
  }

  test("lineDedup is idempotent: a second pass removes nothing") {
    import spark.implicits._
    for (seed <- 1L to 5L) {
      // random multi-line docs with planted shared lines
      val shared = sample(docGen(6), seed * 31)
      val docs = (1L to 8L).map { id =>
        val own = sample(docGen(6), seed * 100 + id)
        (id, if (id % 2 == 0) s"$shared\n$own" else s"$own\n$shared")
      }.toDF("id", "text")
      val once = graft.operators.Dedup.lineDedup(docs, "id", "text")
      val clean = once.select(col("id"), col("clean_text").as("text"))
      val twice = graft.operators.Dedup.lineDedup(clean, "id", "text")
      val a = once.select("id", "n_kept", "clean_text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val b = twice.select("id", "n_kept", "clean_text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(a == b, s"seed=$seed: second pass changed the corpus")
    }
  }

  test("unigramXent is invariant under corpus row order and partitioning") {
    import spark.implicits._
    val docs = (1L to 12L).map(id => (id, sample(docGen(15), id))).toDF("id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Corpus.unigramXent(df, "id", "text")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val a = run(docs)
    val b = run(docs.orderBy(col("id").desc).repartition(7))
    assert(a.keySet == b.keySet)
    // token counts exactly; xent within 1e-3 — unlike the gate corpus
    // (whose rounding-boundary margins are measured), docGen docs carry
    // no margin guarantee, and partial-sum merge order is
    // scheduler-dependent, so exact Double equality would be a latent
    // flake on a value near a 1e-4 boundary
    a.foreach { case (id, (n, x)) =>
      assert(b(id)._1 == n)
      assert(math.abs(b(id)._2 - x) < 1e-3, s"id=$id $x vs ${b(id)._2}")
    }
  }

  test("dsirWeights: weights shift up monotonically for target-like docs") {
    import spark.implicits._
    // a doc made of target-only vocabulary must outweigh a doc made of
    // non-target vocabulary, for any seed
    for (seed <- 1L to 5L) {
      val tgtVocab = sample(docGen(10), seed)
      val rawVocab = sample(docGen(10), seed + 1000)
      val docs = Seq(
        (1L, tgtVocab, true), (2L, tgtVocab, true),
        (3L, rawVocab, false), (4L, rawVocab, false),
        (5L, tgtVocab, false), // target-like, outside the target set
        (6L, rawVocab, false)).toDF("id", "text", "t")
      val w = graft.operators.Corpus.dsirWeights(docs, "id", "text", col("t"))
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(w(5L) > w(6L),
        s"seed=$seed: target-vocab doc ${w(5L)} <= raw-vocab doc ${w(6L)}")
    }
  }

  test("remerge: concatenation preserved, no adjacent target pair survives") {
    // The shared re-segmentation walk behind BOTH merge-table trainers
    // (Bpe.remerge): a left-to-right non-overlapping pass must (a)
    // preserve the concatenated string, (b) leave NO adjacent (l, r)
    // occurrence, and (c) be idempotent for its pair.
    val symGen = Gen.listOfN(12, Gen.oneOf("a", "b", "ab", "ba"))
    for (seed <- 1L to 40L) {
      val syms = sample(symGen, seed).toVector
      val pair = sample(Gen.oneOf(("a", "b"), ("b", "a"), ("a", "a"),
        ("ab", "b"), ("b", "ab")), seed + 999)
      val out = graft.operators.Bpe.remerge(syms, pair)
      assert(out.mkString == syms.mkString, s"seed=$seed: content changed")
      out.sliding(2).filter(_.length == 2).foreach { w =>
        assert((w(0), w(1)) != pair,
          s"seed=$seed: pair $pair survived in $out")
      }
      assert(graft.operators.Bpe.remerge(out, pair) == out,
        s"seed=$seed: remerge not idempotent")
    }
  }

  test("WordPiece greedy encode: reassembly and piece-count bounds on random words") {
    for (seed <- 1L to 10L) {
      import spark.implicits._
      val docs = Seq((1L, sample(docGen(30), seed))).toDF("id", "text")
      val m = graft.operators.WordPiece.trainMerges(docs, "text", nMerges = 6)
      for (ws <- 1 to 8) {
        val w = sample(wordGen, seed * 100 + ws)
        val pieces = m.encodeWord(w)
        assert(pieces.mkString == w, s"seed=$seed: $w -> $pieces")
        assert(pieces.nonEmpty && pieces.length <= w.length)
      }
    }
  }

  test("HNSW exhaustive-ef beam equals exact top-k on random vector sets") {
    // The connectivity guarantee generalized: for ANY vector set, an
    // ef = n beam over the repaired graph must return the exact top-k
    // under the same bit-parity scoring — regardless of metric.
    import spark.implicits._
    val vecGen = Gen.listOfN(6, Gen.choose(-1.0f, 1.0f))
    for ((metric, seed) <- Seq(("dot", 1L), ("cosine", 2L), ("l2", 3L))) {
      val n = 120
      val rows = (0L until n.toLong).map(i =>
        (i, sample(vecGen, seed * 10000 + i).toSeq))
      val df = rows.toDF("vec_id", "embedding")
      val q = df.filter(col("vec_id") % 7 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      def pairs(d: org.apache.spark.sql.DataFrame) =
        d.select("query_id", "rank", "match_id")
          .as[(Long, Int, Long)].collect().sorted.toSeq
      val got = pairs(graft.operators.HnswSearch.hnswTopK(q, "query_id",
        "qv", df, "vec_id", "embedding", k = 3, metric = metric,
        m = 4, efConstruction = 8, efSearch = n, nShards = 1))
      val exact = pairs(graft.operators.VectorSearch.topKFlat(q, "query_id",
        "qv", df, "vec_id", "embedding", k = 3, metric = metric))
      assert(got == exact, s"metric=$metric diverged from exact")
    }
  }
}
