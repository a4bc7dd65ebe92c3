package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bpe, UnigramLm}

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("EM discovers the obvious piece: repeated bigram beats characters") {
    // a corpus dominated by 'ababab': the unigram model must keep 'ab'
    // (or a longer ab-run) and segment the word into few pieces, not chars
    val docs = Seq.fill(20)((1L, "ababab ababab cd")).zipWithIndex
      .map { case ((_, t), i) => (i.toLong, t) }.toDF("id", "text")
    val m = UnigramLm.train(docs, "text", vocabSize = 12, rounds = 3,
      maxPieceLen = 4)
    val seg = m.segmentWord("ababab")
    assert(seg.mkString == "ababab")
    assert(seg.length <= 3, s"EM failed to keep a multi-char piece: $seg")
    assert(m.logp.keys.exists(p => p.length > 1 && p.startsWith("ab")),
      s"no ab-piece in vocab: ${m.pieces.map(_._1)}")
  }

  test("hard-EM likelihood is non-increasing over rounds (pre-prune)") {
    // classical Viterbi-EM monotonicity holds for the UNPRUNED
    // trajectory: a huge vocabSize makes the final prune a no-op, and
    // the only non-E-step mass is the tiny unused-char floor — covered
    // by a 0.1% tolerance. (A pruned model's NLL is NOT monotone in
    // rounds: the cut can land differently per round count.)
    val docs = Tables(spark, sf, "documents").filter(col("doc_id") < 60)
      .select(col("doc_id").as("id"), col("text"))
    val types = Bpe.wordTypes(docs, "text", 100000).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val nlls = (1 to 3).map { r =>
      UnigramLm.train(docs, "text", vocabSize = 1000000, rounds = r)
        .negLogLikelihood(types)
    }
    assert(nlls(1) <= nlls(0) * 1.001 && nlls(2) <= nlls(1) * 1.001,
      s"likelihood regressed across rounds: $nlls")
  }

  test("driver-side candidate derivation equals the relational (oracled) stage") {
    val docs = Tables(spark, sf, "documents").filter(col("doc_id") < 40)
      .select(col("doc_id").as("id"), col("text"))
    val relational = UnigramLm.candidates(docs, "text", maxPieceLen = 4,
        maxCandidates = 60)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val types = Bpe.wordTypes(docs, "text", 1000000).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val driver = UnigramLm.candidatesFromTypes(types, 4, 60).toMap
    assert(driver == relational, "train's one-pass inventory diverged")
  }

  test("coverage and roundtrip: every word segments and reassembles; chars kept") {
    val docs = Tables(spark, sf, "documents").filter(col("doc_id") < 80)
      .select(col("doc_id").as("id"), col("text"))
    val m = UnigramLm.train(docs, "text", vocabSize = 200, rounds = 2)
    val enc = UnigramLm.encodeCount(docs, "id", "text", m).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      assert(r.getBoolean(3), s"roundtrip failed for doc ${r.getLong(0)}")
      assert(r.getLong(2) >= r.getLong(1),
        "fewer pieces than words is impossible")
    }
    // vocab respects the size cap modulo the never-pruned characters
    val chars = m.pieces.count(_._1.length == 1)
    assert(m.pieces.length <= math.max(200, chars))
    // an out-of-vocabulary character degrades to its own piece
    val weird = m.segmentWord("zzÿzz")
    assert(weird.mkString == "zzÿzz")
  }

  test("model is partitioning-invariant (pure function of the capped type table)") {
    val docs = Tables(spark, sf, "documents").filter(col("doc_id") < 50)
      .select(col("doc_id").as("id"), col("text"))
    val a = UnigramLm.train(docs.repartition(7), "text", 150, rounds = 2)
    val b = UnigramLm.train(docs.repartition(2, col("id")), "text", 150, rounds = 2)
    assert(a.pieces == b.pieces)
  }

  test("candidates: frequency-weighted substrings, chars always present") {
    val docs = Seq((1L, "aba aba cc")).toDF("id", "text")
    val cand = UnigramLm.candidates(docs, "text", maxPieceLen = 3,
        maxCandidates = 100)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 'aba' appears in 2 type-instances of word 'aba' (cnt 2): substrings
    // a(x2 per word -> 4), b(2), ab(2), ba(2), aba(2); cc: c(2), cc(1)
    assert(cand("aba") == 2L && cand("ab") == 2L && cand("a") == 4L)
    assert(cand("c") == 2L && cand("cc") == 1L)
    // cap keeps top-N but every char survives
    val capped = UnigramLm.candidates(docs, "text", 3, maxCandidates = 1)
      .collect().map(_.getString(0)).toSet
    assert(Set("a", "b", "c").subsetOf(capped))
  }
}
