package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer induction (Schuster & Nakajima, ICASSP 2012 —
  * the BERT tokenizer family), the THIRD tokenizer trainer next to
  * [[Bpe]] (frequency-argmax merges) and [[UnigramLm]] (prune-under-EM).
  *
  * Same engine shape as [[Bpe]]: training never iterates over the
  * corpus — ONE tokenize+count pass reduces it to the Zipf-bounded
  * word-type table (the [[Bpe.wordTypes]] aggregate, reused verbatim),
  * and the merge loop runs driver-side over that model-sized table.
  * What differs is the SELECTION CRITERION: where BPE merges the most
  * frequent adjacent pair, WordPiece merges the pair maximizing the
  * likelihood ratio
  *
  *   score(a, b) = count(ab) / (count(a) * count(b))
  *
  * i.e. the merge that most increases the corpus likelihood under a
  * unigram model over the current symbol inventory — rare symbols that
  * almost always co-occur merge before frequent-but-independent ones.
  *
  * Determinism / oracle-replayability: all counts are exact longs
  * (< 2^53, exactly representable), and the score is formed as the one
  * IEEE double expression `cnt(ab) / (cnt(a) * cnt(b))` — division and
  * multiplication are correctly rounded, so DuckDB computes the
  * bit-identical double, and the argmax order (score desc, then
  * lexicographic pair) is exactly replayable cross-engine for the
  * first merge (q_wp_head), the [[Bpe]] q_bpe_merge_head discipline.
  *
  * Like the repo's BPE this is the word-internal variant: no `##`
  * continuation marker and no end-of-word symbol, so merges never
  * cross word boundaries and the learned units compose with the
  * whitespace-token convention shared with [[Corpus.docTokenCounts]].
  *
  * Encoding ([[encodeCount]]) is canonical WordPiece inference: greedy
  * longest-match-first over the learned vocabulary (all single chars
  * seen in training plus every merged unit) — NOT merge-rank replay,
  * which is the BPE apply rule. A character unseen at training time
  * falls back to itself as a 1-char piece (the `[UNK]`-per-char
  * convention), keeping the n_words <= n_pieces <= n_chars bounds.
  */
object WordPiece {

  /** Learned model: merge table (rank order) + greedy-match vocab. */
  final case class WpModel(merges: IndexedSeq[(String, String)],
      vocab: Set[String]) {
    private lazy val maxLen: Int =
      if (vocab.isEmpty) 1 else vocab.iterator.map(_.length).max

    /** Greedy longest-match-first segmentation of one word. */
    def encodeWord(word: String): Seq[String] = {
      if (word.isEmpty) return Nil
      val out = Seq.newBuilder[String]
      var i = 0
      while (i < word.length) {
        var len = math.min(maxLen, word.length - i)
        // longest vocab prefix; a 1-char miss (char unseen in training)
        // still advances as its own piece
        while (len > 1 && !vocab.contains(word.substring(i, i + len)))
          len -= 1
        out += word.substring(i, i + len)
        i += len
      }
      out.result()
    }
  }

  /** Train `nMerges` WordPiece merges from one corpus pass (the
    * [[Bpe.wordTypes]] aggregate); the likelihood-ratio merge loop is
    * driver-side over the model-sized type table.
    */
  def trainMerges(df: DataFrame, textCol: String, nMerges: Int,
      maxTypes: Int = 1000000): WpModel = {
    require(nMerges >= 0, s"trainMerges: nMerges=$nMerges")
    require(maxTypes > 0, s"trainMerges: maxTypes=$maxTypes")
    var words = Bpe.segmentedTypes(df, textCol, maxTypes)
    val chars: Set[String] = words.iterator.flatMap(_._1).toSet
    val merges = IndexedSeq.newBuilder[(String, String)]
    var vocab = chars
    var i = 0
    var exhausted = false
    while (i < nMerges && !exhausted) {
      // one pass over the type table: current unit counts + pair counts
      val unitCounts = scala.collection.mutable.HashMap.empty[String, Long]
      val pairCounts =
        scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length) {
          unitCounts(syms(j)) = unitCounts.getOrElse(syms(j), 0L) + c
          if (j < syms.length - 1) {
            val p = (syms(j), syms(j + 1))
            pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          }
          j += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        // argmax of the IEEE-double likelihood ratio, ties by
        // lexicographic (left, right) — bit-replayable in DuckDB
        val best = pairCounts.toSeq.minBy { case ((l, r), c) =>
          (-(c.toDouble / (unitCounts(l).toDouble * unitCounts(r).toDouble)),
            l, r)
        }._1
        merges += best
        vocab = vocab + (best._1 + best._2)
        // the re-segmentation walk is Bpe.remerge — ONE implementation
        // for both trainer families
        words = words.map { case (syms, c) => (Bpe.remerge(syms, best), c) }
      }
      i += 1
    }
    WpModel(merges.result(), vocab)
  }

  /** The learned merges as a (rank, lhs, rhs) DataFrame. */
  def mergesDf(df: DataFrame, textCol: String, nMerges: Int,
      maxTypes: Int = 1000000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    trainMerges(df, textCol, nMerges, maxTypes).merges.zipWithIndex
      .map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "lhs", "rhs") // not left/right: SQL reserved words
  }

  /** Per-document WordPiece piece count under the broadcast model —
    * one narrow map. Output: (id, n_wp_tok).
    */
  def encodeCount(df: DataFrame, idCol: String, textCol: String,
      model: WpModel): DataFrame = {
    val local = model
    // null text propagates a null token array into the udf (Spark does
    // not null-shield reference-typed args) — count it as 0 tokens
    val cnt = udf((words: Seq[String]) =>
      if (words == null) 0L
      else words.map(w => local.encodeWord(w).length.toLong).sum)
    df.select(col(idCol).as("id"),
      cnt(Bpe.toks(col(textCol))).as("n_wp_tok"))
  }
}
