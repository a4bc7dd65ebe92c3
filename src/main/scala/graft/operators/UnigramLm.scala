package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer induction (Kudo, ACL 2018 — the SentencePiece
  * unigram model): the OTHER standard subword tokenizer next to
  * [[Bpe]]. Where BPE grows units bottom-up by merging, the unigram
  * model starts from a LARGE candidate piece inventory and prunes it
  * down under an EM-estimated piece distribution; encoding is the
  * Viterbi segmentation under piece log-probabilities.
  *
  * Training never iterates over the corpus — the [[Bpe.trainMerges]]
  * discipline: ONE tokenize+count pass reduces the corpus to the
  * Zipf-bounded word-type table, and everything after runs driver-side
  * over that model-sized table:
  *
  *  1. candidates: every substring (length ≤ `maxPieceLen`) of the
  *     word types, frequency-weighted by type counts; top
  *     `maxCandidates` by (freq desc, piece asc) plus every single
  *     character (characters are never pruned — any word stays
  *     segmentable). This stage is pure relational algebra and is
  *     FULLY ORACLED (q_ulm_candidates replays it in DuckDB).
  *  2. hard-EM (Viterbi-EM) rounds: E-step segments each word type
  *     under the current piece log-probs (deterministic tie-breaks:
  *     higher score, then FEWER pieces, then lexicographically
  *     earlier piece sequence); M-step re-estimates piece
  *     probabilities from the weighted segmentation counts. Hard EM
  *     monotonically improves the complete-data likelihood
  *     (UnigramLmSpec asserts the corpus neg-log-likelihood is
  *     non-increasing round over round).
  *  3. prune to `vocabSize` by (count desc, piece asc), characters
  *     always retained; final log-probs from the last counts.
  *
  * Everything downstream of the one corpus pass is a pure function of
  * the capped type table, so the model is identical under any corpus
  * partitioning (the [[Bpe]] determinism argument).
  */
object UnigramLm {

  /** Trained model: (piece, logProb), probability-sorted best-first
    * with (logp desc, piece asc) ties.
    */
  final case class UlmModel(pieces: IndexedSeq[(String, Double)]) {
    lazy val logp: Map[String, Double] = pieces.toMap
    // hoisted: segmentWord is the hot path of both EM and encode, and
    // re-deriving this constant per call would scan the vocab each time
    private lazy val maxLen: Int = pieces.iterator.map(_._1.length).max

    /** Viterbi segmentation of one word under the piece distribution.
      * DP over end positions; ties break deterministically: higher
      * score, then fewer pieces, then the lexicographically earlier
      * LAST piece (applied left-to-right this yields the
      * lexicographically earliest piece sequence among optima).
      * Characters are always in the vocab, so every word segments.
      */
    def segmentWord(word: String): Seq[String] = {
      if (word.isEmpty) return Nil
      val n = word.length
      // best(i): (score, nPieces, lastPiece) for word[0, i)
      val score = Array.fill(n + 1)(Double.NegativeInfinity)
      val nPieces = Array.fill(n + 1)(Int.MaxValue)
      val back = new Array[Int](n + 1) // start index of the last piece
      val lastPiece = new Array[String](n + 1)
      score(0) = 0.0; nPieces(0) = 0
      var i = 1
      while (i <= n) {
        var j = math.max(0, i - maxLen)
        while (j < i) {
          if (score(j) != Double.NegativeInfinity) {
            val piece = word.substring(j, i)
            logp.get(piece).foreach { lp =>
              val s = score(j) + lp
              val np = nPieces(j) + 1
              val better = s > score(i) ||
                (s == score(i) && (np < nPieces(i) ||
                  (np == nPieces(i) && piece < lastPiece(i))))
              if (better) {
                score(i) = s; nPieces(i) = np; back(i) = j; lastPiece(i) = piece
              }
            }
          }
          j += 1
        }
        // out-of-vocabulary fallback: a character never seen at train
        // time (encode-time-only input) becomes its own piece under a
        // strong penalty — coverage never breaks, roundtrip still holds
        if (score(i) == Double.NegativeInfinity) {
          score(i) = score(i - 1) - 100.0
          nPieces(i) = nPieces(i - 1) + 1
          back(i) = i - 1
          lastPiece(i) = word.substring(i - 1, i)
        }
        i += 1
      }
      // chars are always present -> score(n) is finite
      var out = List.empty[String]
      var pos = n
      while (pos > 0) { out = lastPiece(pos) :: out; pos = back(pos) }
      out
    }

    /** Corpus hard-EM negative log-likelihood of a weighted type table
      * under this model (the quantity Viterbi-EM decreases).
      */
    def negLogLikelihood(types: Seq[(String, Long)]): Double =
      types.iterator.map { case (w, c) =>
        -c.toDouble * segmentWord(w).iterator
          .map(p => logp.getOrElse(p, -100.0)).sum
      }.sum
  }

  /** Candidate piece inventory — stage 1, relational and fully
    * oracled: top `maxCandidates` substrings of the word types by
    * (frequency-weighted count desc, piece asc), UNION all single
    * characters. Output (piece, freq); character rows carry their true
    * frequency even when outside the top cap.
    */
  def candidates(df: DataFrame, textCol: String,
      maxPieceLen: Int = 6, maxCandidates: Int = 2000,
      maxTypes: Int = 1000000): DataFrame = {
    require(maxPieceLen >= 1, s"maxPieceLen=$maxPieceLen")
    require(maxCandidates >= 1, s"maxCandidates=$maxCandidates")
    val types = Bpe.wordTypes(df, textCol, maxTypes)
    // all substrings of length 1..maxPieceLen, weighted by type count
    // (two explodes over slim (word, cnt) rows; the substring uses the
    // SQL form because the Column API takes only literal offsets)
    val pieceFreq = types
      .select(col("word"), col("cnt"))
      .withColumn("l", explode(sequence(lit(1),
        least(lit(maxPieceLen), length(col("word"))))))
      .withColumn("i", explode(sequence(lit(1),
        length(col("word")) - col("l") + 1)))
      .select(expr("substring(word, i, l)").as("piece"), col("cnt"))
      .groupBy("piece").agg(sum(col("cnt")).as("freq"))
    val top = pieceFreq
      .orderBy(col("freq").desc, col("piece"))
      .limit(maxCandidates)
    val chars = pieceFreq.filter(length(col("piece")) === 1)
    top.unionByName(chars).distinct()
  }

  /** [[candidates]] as a driver-side pure function of an already
    * collected type table — identical output (UnigramLmSpec asserts
    * it), so [[train]] pays ONE corpus pass and derives the inventory
    * from the model-sized table it already holds.
    */
  private[graft] def candidatesFromTypes(
      types: Seq[(String, Long)], maxPieceLen: Int,
      maxCandidates: Int): Seq[(String, Long)] = {
    val freq = scala.collection.mutable.Map.empty[String, Long]
    types.foreach { case (w, c) =>
      var l = 1
      while (l <= math.min(maxPieceLen, w.length)) {
        var i = 0
        while (i + l <= w.length) {
          val piece = w.substring(i, i + l)
          freq(piece) = freq.getOrElse(piece, 0L) + c
          i += 1
        }
        l += 1
      }
    }
    val sorted = freq.toSeq.sortBy { case (p, f) => (-f, p) }
    (sorted.take(maxCandidates) ++ sorted.filter(_._1.length == 1)).distinct
  }

  /** Train the unigram LM — stages 2–3 (see object doc). */
  def train(df: DataFrame, textCol: String, vocabSize: Int,
      rounds: Int = 3, maxPieceLen: Int = 6, maxCandidates: Int = 2000,
      maxTypes: Int = 1000000): UlmModel = {
    require(vocabSize >= 1, s"vocabSize=$vocabSize")
    require(rounds >= 1, s"rounds=$rounds")
    val types = Bpe.wordTypes(df, textCol, maxTypes).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    require(types.nonEmpty, "unigram-lm: empty corpus")
    // the documented ONE-pass discipline: the candidate inventory is a
    // pure function of the type table just collected — recomputing it
    // relationally would tokenize the corpus a second time
    val cand = candidatesFromTypes(types, maxPieceLen, maxCandidates)
    // init: probabilities proportional to raw candidate frequencies
    var model = toModel(cand.map { case (p, f) => (p, f.toDouble) })
    (1 to rounds).foreach { _ =>
      // E: Viterbi counts, weighted by type counts; M: re-normalize.
      // Pieces never chosen by any segmentation drop out; single chars
      // are re-seeded with a floor count so coverage can never break.
      val counts = scala.collection.mutable.Map.empty[String, Double]
      types.foreach { case (w, c) =>
        model.segmentWord(w).foreach { p =>
          counts(p) = counts.getOrElse(p, 0.0) + c.toDouble
        }
      }
      val chars = cand.iterator.filter(_._1.length == 1)
        .map { case (p, _) => (p, counts.getOrElse(p, 0.5)) }
      val multi = counts.iterator.filter(_._1.length > 1)
      model = toModel((chars ++ multi).toSeq)
    }
    // prune to vocabSize by (prob desc, piece asc), chars always kept
    val (chars, multi) = model.pieces.partition(_._1.length == 1)
    val kept = chars ++ multi.take(math.max(0, vocabSize - chars.length))
    toModel(kept.map { case (p, lp) => (p, math.exp(lp)) })
  }

  private def toModel(weighted: Seq[(String, Double)]): UlmModel = {
    val total = weighted.iterator.map(_._2).sum
    UlmModel(weighted.map { case (p, w) => (p, math.log(w / total)) }
      .sortBy { case (p, lp) => (-lp, p) }.toIndexedSeq)
  }

  /** Per-document segmentation accounting under a broadcast model — a
    * narrow map (the [[Bpe.encodeCount]] shape): (id, n_words,
    * n_pieces, roundtrip_ok). roundtrip_ok pins that every word's
    * Viterbi pieces concatenate back to the word; n_pieces is bounded
    * by [n_words, n_chars] by construction.
    */
  def encodeCount(df: DataFrame, idCol: String, textCol: String,
      model: UlmModel): DataFrame = {
    val m = model
    // words come from the SAME column-side tokenization the training
    // pass used (Bpe.toks) — a driver-side re-implementation would be a
    // third copy of the split rule and Java's locale-sensitive
    // toLowerCase (tr-TR dotless-i) could silently diverge from SQL
    // lower(), pushing every affected word onto the OOV fallback
    val seg = udf((words: Seq[String]) => {
      val ws = if (words == null) Seq.empty[String] else words
      val segs = ws.map(w => m.segmentWord(w))
      val ok = ws.zip(segs).forall { case (w, s) => s.mkString == w }
      (ws.length.toLong, segs.iterator.map(_.length.toLong).sum, ok)
    })
    df.select(col(idCol).as("id"), seg(Bpe.toks(col(textCol))).as("__s"))
      .select(col("id"), col("__s._1").as("n_words"),
        col("__s._2").as("n_pieces"), col("__s._3").as("roundtrip_ok"))
  }
}
