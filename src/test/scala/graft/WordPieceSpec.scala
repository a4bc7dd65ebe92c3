package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bpe, WordPiece}

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  test("likelihood ratio prefers rare-but-coupled over frequent-but-independent") {
    // (a,b): pair 4, c(a)=4, c(b)=4 -> 4/16 = 0.25
    // (x,q): pair 1, c(x)=1, c(q)=1 -> 1/1  = 1.0  -> WordPiece merges (x,q)
    // while frequency-argmax BPE merges (a,b) on the same corpus.
    val docs = Seq((1L, "ab ab ab ab xq")).toDF("id", "text")
    val wp = WordPiece.trainMerges(docs, "text", nMerges = 1)
    assert(wp.merges == IndexedSeq(("x", "q")), wp.merges)
    val bpe = Bpe.trainMerges(docs, "text", nMerges = 1)
    assert(bpe.merges == IndexedSeq(("a", "b")), bpe.merges)
  }

  test("argmax tie-break is lexicographic on the pair") {
    // (x,y) and (x,z): pair 2 each, c(x)=4, c(y)=c(z)=2 -> scores tie
    val docs = Seq((1L, "xy xy xz xz")).toDF("id", "text")
    val m = WordPiece.trainMerges(docs, "text", nMerges = 1)
    assert(m.merges == IndexedSeq(("x", "y")), m.merges)
  }

  test("merged units re-segment before the next round's counts") {
    // After (x,q) merges, "xq" contributes unit xq (count 1), so round 2
    // scores pairs over the NEW segmentation: "ab" pairs remain, and
    // (a,b) = 4/(4*4) = 0.25 now wins over nothing else.
    val docs = Seq((1L, "ab ab ab ab xq")).toDF("id", "text")
    val m = WordPiece.trainMerges(docs, "text", nMerges = 2)
    assert(m.merges == IndexedSeq(("x", "q"), ("a", "b")), m.merges)
    assert(m.vocab.contains("xq") && m.vocab.contains("ab"))
  }

  test("greedy longest-match encode: reassembly, fallback, empty word") {
    val docs = Seq((1L, "abab abab abc xq")).toDF("id", "text")
    val m = WordPiece.trainMerges(docs, "text", nMerges = 3)
    // every encoding concatenates back to the input
    Seq("abab", "abc", "xq", "aabba", "b").foreach { w =>
      assert(m.encodeWord(w).mkString == w, s"roundtrip of $w")
    }
    assert(m.encodeWord("") == Nil)
    // chars unseen in training fall back to 1-char pieces
    assert(m.encodeWord("zz") == Seq("z", "z"))
    // longest match first: with "ab" in vocab, "ab" encodes as one piece
    assert(m.vocab.contains("ab"))
    assert(m.encodeWord("ab") == Seq("ab"))
  }

  test("training is deterministic under repartitioning") {
    val docs = Tables(spark, sf, "documents").limit(80)
    val a = WordPiece.trainMerges(docs, "text", nMerges = 8)
    val b = WordPiece.trainMerges(docs.repartition(7), "text", nMerges = 8)
    assert(a.merges == b.merges)
  }

  test("encodeCount bounds: n_words <= n_wp_tok <= n_chars") {
    val docs = Tables(spark, sf, "documents").limit(60)
    val m = WordPiece.trainMerges(docs, "text", nMerges = 12)
    val toksCol = filter(split(lower(trim(col("text"))), "[ \\t\\n\\f\\r]+"),
      x => length(x) > 0)
    val bounds = docs.select(col("doc_id"),
      size(toksCol).cast("long").as("nw"),
      aggregate(toksCol, lit(0L), (a, x) => a + length(x)).as("nc"))
    val rows = WordPiece.encodeCount(docs, "doc_id", "text", m)
      .join(bounds, col("id") === col("doc_id"))
      .select(col("id"), col("n_wp_tok"), col("nw"), col("nc"))
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, nw, nc) =>
      assert(n >= nw && n <= nc, s"doc $id: $nw <= $n <= $nc violated")
    }
  }

  test("encodeCount tolerates null text (0 tokens), for BPE too") {
    val docs = Seq((1L, "ab ab"), (2L, null)).toDF("id", "text")
    val m = WordPiece.trainMerges(docs, "text", nMerges = 1)
    val got = WordPiece.encodeCount(docs, "id", "text", m)
      .as[(Long, Long)].collect().toMap
    assert(got(2L) == 0L && got(1L) > 0L, got)
    val bm = Bpe.trainMerges(docs, "text", nMerges = 1)
    val bgot = Bpe.encodeCount(docs, "id", "text", bm)
      .as[(Long, Long)].collect().toMap
    assert(bgot(2L) == 0L && bgot(1L) > 0L, bgot)
  }

  test("first merge agrees with a direct single-pass recomputation") {
    // Independent derivation of round 1 straight from word types,
    // without the trainer's re-segmentation machinery.
    val docs = Tables(spark, sf, "documents").limit(100)
    val types = Bpe.wordTypes(docs, "text", 1000000).as[(String, Long)]
      .collect()
    val cc = scala.collection.mutable.HashMap.empty[String, Long]
    val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
    types.foreach { case (w, c) =>
      w.foreach(ch => cc(ch.toString) = cc.getOrElse(ch.toString, 0L) + c)
      w.sliding(2).filter(_.length == 2).foreach { p =>
        val k = (p(0).toString, p(1).toString)
        pc(k) = pc.getOrElse(k, 0L) + c
      }
    }
    val expect = pc.toSeq.minBy { case ((l, r), c) =>
      (-(c.toDouble / (cc(l).toDouble * cc(r).toDouble)), l, r)
    }._1
    val m = WordPiece.trainMerges(docs, "text", nMerges = 1)
    assert(m.merges.head == expect)
  }
}
