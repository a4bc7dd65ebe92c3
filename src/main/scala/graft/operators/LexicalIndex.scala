package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** At-rest lexical index: the persisted, APPEND-ONLY form of the three
  * offline BM25 artifacts ([[Lexical.postings]], [[Lexical.corpusStats]],
  * [[Lexical.termDf]]) — the lexical twin of the persisted vector
  * indexes ([[IvfSearch.writeIndex]] / appendToIndex), so a
  * continuously-ingested corpus can serve HYBRID retrieval without a
  * batch re-index: the vector side appends through the IVF family, the
  * lexical side appends here, and [[Lexical.hybridTopK]] reads both as
  * supplied artifacts.
  *
  * Layout under `path`:
  *  - `postings/` — (id, dl, tok, tf) parquet, partitioned by
  *    `bucket = pmod(xxhash64(tok), NBuckets)`: a serve path whose query
  *    term set is driver-known ([[postingsForTerms]]) prunes unprobed
  *    bucket directories at file-listing time, exactly like the IVF
  *    probe's cell pruning — the 100 TB posture for a handful of query
  *    terms against a corpus-sized posting store.
  *  - `stats/` — one (n, sumdl) partial row PER APPEND. Reading sums the
  *    partials: counts and integer-valued double sums are exact under
  *    addition (≤ 2^53), so (n, avgdl = sumdl/n) is bit-identical to the
  *    batch [[Lexical.corpusStats]] over the unioned corpus regardless
  *    of how ingestion was batched.
  *
  * df per term is DERIVED from the posting store ((id, tok) rows are
  * distinct by construction), never stored — a stored df would need
  * read-modify-write per append; the derived one is append-free and the
  * aggregation is Zipf-bounded (vocabulary-sized).
  *
  * Contract: append batches carry documents whose ids are NOT already in
  * the index (the same new-rows contract as the vector appendToIndex
  * family) — re-ingesting a document would double its postings. The
  * streaming front-ends pair this with the cross-epoch dedup stores.
  */
object LexicalIndex {

  /** Posting-store partition fan-out. 64 directories keeps listing cheap
    * while a 3-term query prunes ~95% of a corpus-sized store.
    */
  val NBuckets = 64

  private def bucketed(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    Lexical.postings(docs, idCol, textCol)
      // int, not long: partition-directory values infer back as int, and
      // the serve-time IN filter must hit the inferred type exactly for
      // the pruning to happen at file-listing time (a cast around a
      // partition column defeats pruning)
      .withColumn("bucket", pmod(xxhash64(col("tok")), lit(NBuckets)).cast("int"))

  private def statsRow(docs: DataFrame, textCol: String): DataFrame =
    docs.agg(count(lit(1)).as("n"),
      sum(size(Lexical.toks(col(textCol)))).cast("double").as("sumdl"))

  /** Build (or rebuild) the index from a corpus — the offline "index
    * once" half; [[appendToIndex]] is the online "append forever" half.
    */
  def writeIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String): Unit = {
    bucketed(docs, idCol, textCol)
      .write.partitionBy("bucket").mode("overwrite").parquet(s"$path/postings")
    statsRow(docs, textCol)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Append one batch of NEW documents. Fails loudly on a missing or
    * unreachable store (Hadoop-FS probe): an absent index must never be
    * silently (re)created mid-stream — that is the silent-empty failure
    * mode the cross-epoch stores were hardened against. Returns the
    * number of documents appended.
    */
  def appendToIndex(batch: DataFrame, idCol: String, textCol: String,
      path: String): Long = {
    val spark = batch.sparkSession
    require(FsUtil.exists(spark, s"$path/stats"),
      s"lexical index at '$path' does not exist or is unreachable — " +
        "writeIndex first (appending to a missing store would serve empty postings)")
    bucketed(batch, idCol, textCol)
      .write.partitionBy("bucket").mode("append").parquet(s"$path/postings")
    val s = statsRow(batch, textCol).collect()(0)
    val n = s.getLong(0)
    import spark.implicits._
    // one partial row per append; readers sum partials (exact — see above)
    Seq((n, if (s.isNullAt(1)) 0.0 else s.getDouble(1))).toDF("n", "sumdl")
      .coalesce(1).write.mode("append").parquet(s"$path/stats")
    n
  }

  /** The full posting list, shaped for the `post` parameter of
    * [[Lexical.bm25Scores]]/[[Lexical.bm25TopK]]/[[Lexical.hybridTopK]].
    */
  def postings(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/postings").select("id", "dl", "tok", "tf")

  /** Compact the store — see [[IndexMaintenance]] for the decay this
    * cures and the swap discipline. Postings collapse to one file per
    * bucket (serve-identical; `bucket=` partition values preserved, so
    * [[postingsForTerms]] pruning is untouched); the per-append stats
    * partials collapse to one pre-summed row — exact, because the
    * partials are counts and integer-valued sums under an associative
    * `sum`, so readers of the compacted store compute bit-identical
    * (n, avgdl). Asserted end-to-end on BM25 scores in StreamingSpec.
    * Returns (posting files before, after).
    */
  def compactIndex(spark: SparkSession, path: String): (Long, Long) = {
    require(FsUtil.exists(spark, s"$path/stats"),
      s"lexical index at '$path' does not exist or is unreachable")
    IndexMaintenance.withStoreLock(spark, path) {
      val counts = IndexMaintenance.compactPartitionedDir(
        spark, s"$path/postings", "bucket", NBuckets)
      IndexMaintenance.rewriteDir(spark, s"$path/stats")(
        _.agg(sum(col("n")).as("n"), sum(col("sumdl")).as("sumdl")).coalesce(1))
      counts
    }
  }

  /** Bucket-pruned posting scan for a DRIVER-KNOWN term set: the IN
    * filter on the partition column lists only the terms' bucket
    * directories (cf. the IVF probe). Semantics identical to filtering
    * [[postings]] — callers still equi-join on the term.
    */
  def postingsForTerms(spark: SparkSession, path: String,
      terms: Seq[String]): DataFrame = {
    import spark.implicits._
    // derive the buckets with the SAME expression that partitioned the
    // store (a local-relation job over the driver-known term list) —
    // hand-rolling the hash here would silently desync on a seed change
    val buckets = terms.toDF("t")
      .select(pmod(xxhash64(col("t")), lit(NBuckets)).cast("int")).distinct()
      .collect().map(r => r.getInt(0): Any).toSeq
    spark.read.parquet(s"$path/postings")
      .filter(col("bucket").isin(buckets: _*))
      .select("id", "dl", "tok", "tf")
  }

  /** The (n, avgdl) artifact, shaped for the `stats` parameter of the
    * BM25 family — summed over every append's partial row.
    */
  def corpusStats(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/stats")
      .agg(sum(col("n")).cast("double").as("n"),
        (sum(col("sumdl")) / sum(col("n"))).as("avgdl"))

  /** df per term, shaped for the `dfTable` parameter of
    * [[Lexical.hybridTopK]] — derived from the posting store.
    */
  def termDf(spark: SparkSession, path: String): DataFrame =
    postings(spark, path).groupBy(col("tok"))
      .agg(count(lit(1)).as("__df"))
      .select(col("tok").as("term"), col("__df"))
}
