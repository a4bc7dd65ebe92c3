package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer induction (Sennrich, Haddow & Birch,
  * ACL 2016) — the tokenizer-training step of an LLM data pipeline,
  * learned from the corpus itself.
  *
  * Training never iterates over the corpus: ONE tokenize+count pass
  * reduces it to the Zipf-bounded WORD-TYPE table (distinct word ->
  * count), capped at `maxTypes` by (count desc, word asc) — the
  * standard practice (BPE statistics are a function of type counts,
  * and the truncated Zipf tail contributes negligible pair mass; the
  * cap makes the collect model-sized, the [[PqSearch]] /
  * [[IvfSearch]] training rule). The merge loop then runs driver-side
  * over that model-sized table: `nMerges` iterations of pair-count →
  * argmax (count desc, then lexicographic pair — fully deterministic)
  * → left-to-right non-overlapping re-segmentation.
  *
  * This is the word-internal variant (no end-of-word marker): merges
  * never cross word boundaries, so the learned units compose with the
  * repo's whitespace-token convention and the FIRST merge is exactly
  * the corpus's most frequent adjacent character pair weighted by word
  * counts — an oracle-recomputable fact (q_bpe_merge_head replays it
  * relationally in DuckDB).
  *
  * Encoding ([[encodeCount]]) applies merges in rank order (lowest
  * applicable rank first — the canonical BPE apply) as a narrow
  * per-row map with the broadcast merge table.
  */
object Bpe {

  /** Learned merge table, rank 0 first. */
  final case class BpeModel(merges: IndexedSeq[(String, String)]) {
    /** rank lookup: (left, right) -> rank */
    lazy val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap

    /** Encode one word (sequence of 1-char symbols to start), merging
      * the lowest-rank applicable pair until none applies — the
      * canonical BPE apply loop. Returns the symbol sequence.
      */
    def encodeWord(word: String): Seq[String] = {
      if (word.isEmpty) return Nil
      var syms = word.map(_.toString).toVector
      var done = false
      while (!done && syms.length > 1) {
        var bestRank = Int.MaxValue
        var i = 0
        while (i < syms.length - 1) {
          val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < bestRank) bestRank = r
          i += 1
        }
        if (bestRank == Int.MaxValue) done = true
        else {
          val (l, r) = merges(bestRank)
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
              out += (l + r); j += 2
            } else { out += syms(j); j += 1 }
          }
          syms = out.result()
        }
      }
      syms
    }
  }

  /** The lowercased-whitespace-token convention shared with
    * [[Corpus.docTokenCounts]] (and the DuckDB oracle).
    */
  private[operators] def toks(text: Column): Column =
    filter(split(lower(trim(text)), "[ \\t\\n\\f\\r]+"), t => length(t) > 0)

  /** The corpus's word-type table: (word, cnt), top `maxTypes` by
    * (cnt desc, word asc) — deterministic under the cap.
    */
  def wordTypes(df: DataFrame, textCol: String, maxTypes: Int): DataFrame =
    df.select(explode(toks(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxTypes)

  /** Collapse every non-overlapping left-to-right occurrence of `pair`
    * in a segmented word — the merge-replay walk shared by the BPE and
    * [[WordPiece]] trainers (one implementation so the two tokenizer
    * families can never diverge on re-segmentation semantics).
    */
  private[graft] def remerge(syms: Vector[String],
      pair: (String, String)): Vector[String] = {
    if (syms.length < 2) return syms
    val (bl, br) = pair
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == bl && syms(j + 1) == br) {
        out += (bl + br); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  /** The segmented word-type table both trainers start from: ONE corpus
    * pass to (1-char-segmented word, count), capped at `maxTypes`.
    */
  private[operators] def segmentedTypes(df: DataFrame, textCol: String,
      maxTypes: Int): Array[(Vector[String], Long)] =
    wordTypes(df, textCol, maxTypes).collect()
      .map(r => (r.getString(0).map(_.toString).toVector, r.getLong(1)))

  /** Train `nMerges` BPE merges. One corpus pass (the word-type
    * aggregate, a TakeOrdered under `maxTypes`); the merge loop is
    * driver-side over the model-sized type table.
    */
  def trainMerges(df: DataFrame, textCol: String, nMerges: Int,
      maxTypes: Int = 1000000): BpeModel = {
    require(nMerges >= 0, s"trainMerges: nMerges=$nMerges")
    require(maxTypes > 0, s"trainMerges: maxTypes=$maxTypes")
    var words = segmentedTypes(df, textCol, maxTypes)
    val merges = IndexedSeq.newBuilder[(String, String)]
    var i = 0
    var exhausted = false
    while (i < nMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          j += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        // argmax by count, ties by lexicographic (left, right) —
        // deterministic across runs and platforms
        val best = pairCounts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += best
        words = words.map { case (syms, c) => (remerge(syms, best), c) }
      }
      i += 1
    }
    BpeModel(merges.result())
  }

  /** The learned merges as a (rank, left, right) DataFrame. */
  def mergesDf(df: DataFrame, textCol: String, nMerges: Int,
      maxTypes: Int = 1000000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    trainMerges(df, textCol, nMerges, maxTypes).merges.zipWithIndex
      .map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "lhs", "rhs") // not left/right: SQL reserved words
  }

  /** Per-document BPE token count under the broadcast model — one
    * narrow map (the standard tokenize-for-budgeting step downstream of
    * training). Output: (id, n_bpe_tok).
    */
  def encodeCount(df: DataFrame, idCol: String, textCol: String,
      model: BpeModel): DataFrame = {
    val local = model
    // null text propagates a null token array into the udf (Spark does
    // not null-shield reference-typed args) — count it as 0 tokens
    val cnt = udf((words: Seq[String]) =>
      if (words == null) 0L
      else words.map(w => local.encodeWord(w).length.toLong).sum)
    df.select(col(idCol).as("id"), cnt(toks(col(textCol))).as("n_bpe_tok"))
  }
}
