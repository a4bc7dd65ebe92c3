package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for large-scale training-data pipelines:
  * deterministic stratified sampling, PII redaction, benchmark
  * decontamination, and intra-document repetition statistics.
  *
  * Everything here is either a narrow per-row map (sampling, redaction)
  * or a slim-keyed equi-join (decontamination), so each operator scales
  * linearly with input splits at 100 TB. All arithmetic is integer /
  * regex-on-string and mirrors one-to-one into ANSI SQL, so every
  * operator is DuckDB-oracle-checkable.
  */
object Corpus {

  // --- deterministic sampling ---------------------------------------------

  /** Order-free multiplicative hash of an id into [0, 2^32): Knuth's
    * 2654435761 (golden-ratio) multiplier. The id is reduced mod 2^31
    * first so the product never exceeds 2^31 * 2654435761 < 2^63 —
    * overflow-free in engines that trap int64 overflow (DuckDB) and
    * wrap-free in those that don't (JVM), so both compute the same value
    * for any BIGINT id. NOTE for oracle SQL: `pmod` is non-negative for
    * negative ids; a plain sign-preserving `%` (DuckDB) must be wrapped
    * as `((id % m) + m) % m` to agree — the driver-facing oracles do.
    */
  def sampleHash(id: Column): Column =
    pmod(pmod(id, lit(2147483648L)) * lit(2654435761L), lit(4294967296L))

  /** Deterministic stratified sampling: keep a row iff
    * `sampleHash(id) < rate(stratum) * 2^32`. Sampling is a pure
    * function of the id — stable across runs, executors, and engines
    * (no RNG state, unlike `df.sample`), so a 100 TB re-run or a
    * different partitioning selects the identical subset. Rates are
    * per-stratum with a default; thresholds are precomputed to exact
    * longs on the driver.
    */
  def stratifiedSample(
      df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    def thresh(r: Double): Long = (r * 4294967296d).toLong
    val threshold = rates.foldLeft(lit(thresh(defaultRate))) {
      case (acc, (stratum, r)) =>
        when(col(stratumCol) === stratum, lit(thresh(r))).otherwise(acc)
    }
    df.filter(sampleHash(col(idCol)) < threshold)
  }

  // --- PII redaction -------------------------------------------------------

  /** Regex dialect notes: patterns avoid lookarounds and backreferences so
    * the same string means the same automaton in Java regex (Spark) and
    * RE2 (DuckDB). `\b` is the ASCII word boundary in both.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{4}\\b"
  val UrlRe = "https?://[^\\s]+"

  /** Replace URLs, then emails, then phone numbers with typed placeholder
    * tokens. URL first: an email-shaped substring inside a URL should
    * redact as part of the URL, not survive as a second token.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, UrlRe, "<URL>"),
        EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  /** Per-row PII hit counts (emails counted before redaction, so an
    * email inside a URL counts under both — documented, deterministic).
    */
  def piiCounts(text: Column): (Column, Column, Column) = (
    size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long"),
    size(regexp_extract_all(text, lit(PhoneRe), lit(0))).cast("long"),
    size(regexp_extract_all(text, lit(UrlRe), lit(0))).cast("long"))

  // --- benchmark decontamination ------------------------------------------

  /** Distinct word `n`-grams per document — the shared shingle stage of
    * [[Dedup.ngramJaccardPairs]], exposed for contamination checks.
    */
  def distinctGrams(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"),
        filter(split(lower(trim(col(textCol))), "\\s+"), t => length(t) > 0).as("toks"))
      .filter(size(col("toks")) >= n)
      .withColumn("gram",
        explode(transform(sequence(lit(0), greatest(size(col("toks")) - n, lit(0))),
          i => array_join(slice(col("toks"), i + 1, lit(n)), " "))))
      .select("id", "gram").distinct()

  /** Benchmark decontamination: for every candidate document, the number
    * of distinct word n-grams it shares with the benchmark (eval-set)
    * corpus; rows with `n_shared >= minShared` are contamination flags.
    *
    * Scale shape: the benchmark side is an eval set — small by
    * construction — so its distinct-gram set is explicitly `broadcast`;
    * the candidate side streams map-side through the hash join and the
    * only shuffle is the final per-doc count on slim (id) keys. Work is
    * linear in corpus grams, never |corpus| x |benchmark|.
    */
  def contamination(
      docs: DataFrame, benchmark: DataFrame, idCol: String, textCol: String,
      n: Int = 4, minShared: Long = 1): DataFrame = {
    val docGrams = distinctGrams(docs, idCol, textCol, n)
    val benchGrams = distinctGrams(benchmark, idCol, textCol, n)
      .select("gram").distinct()
    docGrams.join(broadcast(benchGrams), "gram")
      .groupBy("id").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** SEMANTIC decontamination — the embedding-level guard next to the
    * n-gram [[contamination]]: a training document whose embedding is
    * within `threshold` cosine of ANY benchmark embedding is dropped
    * (paraphrased eval leakage that shares no 4-gram still shares the
    * embedding neighborhood). Returns the SURVIVORS of `docs`, schema
    * unchanged.
    *
    * Scale shape: the benchmark side is an eval set — small by
    * construction — so it rides in as a broadcast and the filter is one
    * NARROW anti-join pass over the corpus (a broadcast nested-loop
    * anti-join: each row scans the bench vectors with the codegen'd
    * cosine — |docs| x |bench| x dim multiply-adds with |bench|
    * bounded, zero shuffles). A benchmark too large to broadcast is the
    * cross-set LSH shape ([[Dedup.minhashDupsAgainst]]'s bucket
    * equi-join, with [[graft.operators.Lsh]] buckets) — not this
    * operator's regime.
    */
  def semanticDecontaminate(
      docs: DataFrame, benchmark: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val bench = broadcast(benchmark.select(col(vecCol).as("__bv")))
    docs.join(bench,
      graft.functions.VectorFunctions
        .cosine_similarity(col(vecCol), col("__bv")) >= threshold,
      "left_anti")
  }

  // --- token-budget selection (data mixing) -------------------------------

  /** Fill a per-stratum token budget: within each stratum, documents are
    * visited in [[sampleHash]] order (a deterministic, unbiased
    * shuffle — no RNG state, stable at any cluster size) and kept while
    * the running token total stays within `budget`. This is the core of
    * training-mix construction: "N tokens of source A, M of source B".
    *
    * Scale shape: one window aggregation partitioned by stratum. Strata
    * (sources/domains) are numerous at corpus scale, so the partition-by
    * key fans out; a single giant stratum is the skew case — pre-split
    * it upstream or budget it separately.
    */
  def tokenBudget(
      df: DataFrame, idCol: String, stratumCol: String, tokCol: String,
      budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(sampleHash(col(idCol)), col(idCol))
      .rowsBetween(Long.MinValue, 0)
    df.withColumn("running_tok", sum(col(tokCol)).over(w))
      .filter(col("running_tok") <= budget)
  }

  /** Temperature-based mixture sampling (the multilingual/multi-source
    * rebalancing of Lample & Conneau 2019): stratum `s` with `n_s` rows
    * is sampled at rate `targetRows · q_s / n_s` (capped at 1), where
    * `q_s = w_s / Σ w_j` and `w_s = round(n_s^alpha)` — alpha < 1
    * flattens the mixture toward uniform (upsampling tail strata
    * relative to the head), alpha = 1 preserves natural proportions.
    * Row membership is then the same pure-function-of-the-id hash keep
    * as [[stratifiedSample]] — identical subset on any cluster size.
    *
    * Cross-engine float parity (the rates must reproduce in an ANSI
    * oracle): the weights are ROUNDED TO INTEGERS, so Σ w is exact,
    * and each rate is the fixed evaluation order ((T·w)/Σw)/n of
    * exactly-rounded IEEE ops over exactly-representable integers —
    * bit-identical in any IEEE engine. With alpha = 0.5 the `pow` is
    * `sqrt` (exactly rounded in IEEE 754), so w_s itself is also
    * bit-stable; other alphas depend on the platform's `pow` ulps ONLY
    * when n_s^alpha lands within an ulp of a half-integer — document
    * the alpha you oracle against.
    *
    * Scale shape: one count aggregate (strata are few — sources,
    * languages, domains — so the collect is model-sized) and one
    * narrow hash filter; zero shuffle beyond the count.
    */
  def temperatureSample(df: DataFrame, idCol: String, stratumCol: String,
      alpha: Double, targetRows: Long): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    require(targetRows >= 0, s"targetRows must be >= 0, got $targetRows")
    // null strata are excluded from the mixture AND from the weight
    // mass: they can never match a rate (the hash filter's when-chain
    // is an equality on the stratum), so counting them would silently
    // dilute every real stratum's rate and under-deliver targetRows —
    // and String.valueOf(null) would alias a stratum literally named
    // "null". Rows with a null stratum are dropped, not sampled.
    val counts = df.filter(col(stratumCol).isNotNull)
      .groupBy(stratumCol).count().collect()
      .map(r => String.valueOf(r.get(0)) -> r.getLong(1))
    // alpha = 0.5 routes through sqrt (exactly rounded in IEEE 754,
    // unlike pow's 1-ulp license) so the integerized weight is
    // bit-identical to any oracle engine's round(sqrt(n))
    val w = counts.map { case (s, n) =>
      val x = if (alpha == 0.5) math.sqrt(n.toDouble)
              else math.pow(n.toDouble, alpha)
      s -> math.round(x)
    }
    val sw = w.map(_._2).sum.toDouble
    val rates = counts.zip(w).map { case ((s, n), (_, ws)) =>
      s -> math.min(1.0, targetRows.toDouble * ws / sw / n)
    }.toMap
    stratifiedSample(df, idCol, stratumCol, rates, defaultRate = 0.0)
  }

  /** Deterministic train/val/test (or any banded) split assignment:
    * each id's [[sampleHash]] falls into one of the cumulative-fraction
    * bands, so membership is a pure function of the id — stable across
    * runs, partitionings, and engines (the property eval-set carve-outs
    * must have: a document can never migrate between splits when the
    * corpus is re-processed). `splits` maps label -> fraction and must
    * sum to ≤ 1; ids hashing past the last band get the final label
    * (fractions are exact 2^32-range thresholds, not probabilistic).
    * Zero shuffle — a narrow projection.
    */
  def assignSplits(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "assignSplits: at least one split")
    require(splits.map(_._2).sum <= 1.0 + 1e-9,
      s"assignSplits: fractions sum to ${splits.map(_._2).sum} > 1")
    val cum = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val thresholds = cum.map(c => (c * 4294967296d).toLong)
    val h = sampleHash(col(idCol))
    val expr0: Column = lit(splits.last._1)
    val labeled = splits.zip(thresholds).reverse.foldLeft(expr0) {
      case (acc, ((label, _), thr)) => when(h < thr, lit(label)).otherwise(acc)
    }
    df.withColumn("split", labeled)
  }

  /** Exact-count carve-out: the first `n` ids per stratum in
    * deterministic [[sampleHash]] order — the fixed-size eval-set
    * counterpart to the rate-based [[stratifiedSample]].
    *
    * Scale shape: NOT a row_number window over the stratum key — a web
    * corpus's hot source (one crawl dominating 70% of documents) would
    * serialize that entire stratum onto one unsplittable sort task. The
    * selection is a [[graft.functions.TopKByScore]] bounded-heap
    * aggregation (ascending on the hash, ties by lower id — exactly the
    * `ORDER BY hash, id` the SQL oracle states): map-side partial
    * aggregation carries at most `n` ids per stratum per partition to
    * the shuffle, so the hot stratum costs one O(n)-state heap per input
    * partition instead of a full sort. The ≤ n·|strata| selected ids
    * then semi-join back (null-safe on the stratum — a null stratum is a
    * group, same as the window's partitionBy treated it); AQE broadcasts
    * the selection when it fits, which at eval-carve-out sizes it always
    * does. Null ids cannot be selected (the heap and the join-back both
    * skip them) — the corpus-id contract (non-null integral unique ids)
    * every id-keyed operator here assumes.
    */
  def takePerStratum(df: DataFrame, idCol: String, stratumCol: String,
      n: Int): DataFrame = {
    require(n >= 0, s"takePerStratum: n=$n")
    // integral ids only (the clusterLabels rule): a non-numeric id would
    // cast to null and silently select NOTHING — fail loudly instead
    val idType = df.schema(idCol).dataType
    require(Seq("long", "integer", "short", "byte").contains(idType.typeName),
      s"takePerStratum: id column '$idCol' must be integral, got $idType")
    if (n == 0) return df.limit(0)
    val picked = df
      .select(col(stratumCol).as("__stratum"), col(idCol).cast("long").as("__tid"))
      .groupBy("__stratum")
      .agg(graft.functions.TopKByScore.topK(
        col("__tid"), sampleHash(col("__tid")).cast("double"), n,
        ascending = true).as("__sel"))
      .select(col("__stratum"), explode(col("__sel.id")).as("__tid"))
    df.join(picked,
      col(stratumCol) <=> col("__stratum") &&
        col(idCol).cast("long") === col("__tid"),
      "leftsemi")
  }

  /** Sequence-packing plan (GPT-style pretraining data prep): documents
    * are conceptually concatenated in deterministic [[sampleHash]]
    * shuffle order within each stratum, then chunked into fixed
    * `seqLen`-token training sequences. Emits per document the sequence
    * it STARTS in (`pack_id`), its token offset there (`pack_offset`),
    * and whether it spills across a boundary (`crosses`) — the plan a
    * tokenizer worker executes verbatim, without the text ever moving.
    *
    * All-integer arithmetic on a window cumsum, so a SQL oracle
    * recomputes it exactly. Scale shape: one sort shuffle per stratum —
    * packing is inherently sequential per training stream, and
    * per-stratum parallelism (each source is its own stream) is the
    * standard answer; the windowed rows are slim (id, n_tok), never the
    * text.
    */
  def packSequences(
      df: DataFrame, idCol: String, stratumCol: String, tokCol: String,
      seqLen: Long): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(sampleHash(col(idCol)), col(idCol))
      .rowsBetween(Long.MinValue, -1)
    df.withColumn("cum_before", coalesce(sum(col(tokCol)).over(w), lit(0L)))
      // integer division (`div`), not `/`: long / long is double in
      // Spark SQL, and float quotients have no place in a pack plan
      .withColumn("pack_id", expr(s"cum_before div $seqLen"))
      .withColumn("pack_offset", col("cum_before") % seqLen)
      .withColumn("crosses", col("pack_offset") + col(tokCol) > seqLen)
      .drop("cum_before")
  }

  /** Sliding-window token chunker — the standard RAG ingestion step
    * upstream of the reference's embed-and-store flow (reference
    * README.md:266-283 embeds each record's `content` whole into its
    * vector topic; documents longer than an embedding window are chunked
    * into such records first — a beyond-reference curation op like the
    * dedup/quality family): each document's
    * whitespace tokens (case preserved — retrieval text is not
    * normalized) split into windows of `chunkSize` tokens advancing by
    * `chunkSize - overlap`, so consecutive chunks share `overlap` tokens
    * of context. Chunk count is `1` when the document fits, else
    * `ceil((n - chunkSize) / stride) + 1` — full coverage, and the last
    * window is never a degenerate tail wholly contained in its
    * predecessor. Token-less documents vanish.
    *
    * Output: (id, chunk_id [0-based], n_chunk_tok, chunk_text).
    *
    * Scale shape: pure narrow row-local work — one `transform` +
    * `posexplode` inside whole-stage codegen, ZERO shuffles; output rows
    * ∝ corpus tokens × (1 + overlap/stride). Downstream embedding /
    * indexing ([[graft.functions.Embed]], the IVF/PQ index builders)
    * compose directly on the exploded rows.
    */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got $overlap")
    val stride = chunkSize - overlap
    val toks = filter(split(col(textCol), "[ \\t\\n\\f\\r]+"),
      t => length(t) > 0)
    df.select(col(idCol).as("id"), toks.as("tk"))
      .withColumn("n", size(col("tk")))
      .filter(col("n") > 0)
      .withColumn("nc", when(col("n") <= chunkSize, lit(1)).otherwise(
        ceil((col("n") - chunkSize).cast("double") / stride).cast("int") + 1))
      .select(col("id"), col("n"),
        posexplode(transform(sequence(lit(0), col("nc") - 1),
          i => array_join(slice(col("tk"), i * stride + 1, lit(chunkSize)), " ")))
          .as(Seq("chunk_id", "chunk_text")))
      .select(col("id"), col("chunk_id").cast("long").as("chunk_id"),
        least(lit(chunkSize), col("n") - col("chunk_id") * stride)
          .cast("long").as("n_chunk_tok"),
        col("chunk_text"))
  }

  // --- unigram-LM corpus signals ------------------------------------------

  /** Per-(document, token) counts over lowercased whitespace tokens —
    * the shared first stage of the unigram-LM operators below. Split on
    * the explicit class `[ \t\n\f\r]+` (RE2's `\s`, which the DuckDB
    * oracle uses) so both engines tokenize byte-for-byte identically.
    * One explode + one combine shuffle on (id, tok) — linear in corpus
    * tokens. LAZY localCheckpoint: every consumer references this
    * subtree two or three times and union/join branches don't share
    * work, so the first action materializes it once and later branches
    * read the cached blocks — with no Spark jobs running as a side
    * effect of query CONSTRUCTION (blocks are released when the plan
    * is GC'd, via Spark's context cleaner). Cluster caveat: local
    * checkpoints are non-recoverable — losing an executor after
    * materialization fails the query instead of recomputing the lost
    * blocks. That is the right trade on a single-app analytics run
    * (recompute = rerun the query); a long-lived cluster pipeline that
    * must survive executor churn should persist this stage to a
    * reliable store (`spark.sparkContext.setCheckpointDir` +
    * `.checkpoint()`, or write/read parquet) instead.
    */
  def docTokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        explode(filter(split(lower(trim(col(textCol))), "[ \\t\\n\\f\\r]+"),
          t => length(t) > 0)).as("tok"))
      .groupBy("id", "tok").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false)

  /** CCNet-style quality proxy (Wenzek et al. 2020): each document's
    * cross-entropy under the corpus's OWN unigram LM,
    * `xent(d) = -(1/|d|) Σ_w cnt_{w,d} · ln p(w)` with MLE
    * probabilities `p(w) = c_w / N`. Running prose made of common words
    * scores low; gibberish and rare-token soup scores high — the
    * standard perplexity-bucket filter without an external LM (the
    * zero-egress twin of CCNet's KenLM stage).
    *
    * Scale shape: two hash aggregations plus a shuffle equi-join on the
    * token key; the vocabulary is Zipf-bounded (far smaller than the
    * corpus), so AQE broadcasts it when it fits. The grand total joins
    * in as a 1-row broadcast — no driver collect. Token-less documents
    * simply don't appear (nothing to score).
    *
    * Float parity: the emitted score is round(Σ ln-terms, 4), a double
    * from non-integer arithmetic — unlike the int-ratio doubles
    * elsewhere, so the rounding-boundary question was measured rather
    * than assumed: on the seed-pinned gate corpus every value sits
    * ≥ 1e-7 from its nearest 1e-4 boundary while worst-case
    * cross-engine divergence (libm ulps + summation order over ≤ 500
    * terms) is ~1e-12 — five orders of margin. The margin is ASSERTED
    * mechanically (CorpusSpec "rounding margins"), so a generator churn
    * fails that spec with a named cause instead of surfacing as a
    * mysterious oracle hash mismatch; if it fires, re-measure or drop
    * to 2 decimals.
    */
  def unigramXent(df: DataFrame, idCol: String, textCol: String): DataFrame =
    unigramXentImpl(df, idCol, textCol, rounded = true)

  /** [[unigramXent]] with the rounding switchable off — the UNROUNDED
    * scores feed the rounding-margin assertion in CorpusSpec (corpus
    * churn must fail that spec loudly, not surface as a mysterious
    * oracle hash mismatch).
    */
  private[graft] def unigramXentImpl(df: DataFrame, idCol: String,
      textCol: String, rounded: Boolean): DataFrame =
    unigramXentFromCounts(docTokenCounts(df, idCol, textCol), rounded)

  /** [[unigramXent]] over a PRECOMPUTED (id, tok, cnt) table — the
    * composition entry point: a pipeline that gates on several
    * unigram-LM signals derives them all from ONE tokenize pass
    * (semi-join the count table down between stages) instead of
    * re-scanning the text per stage.
    */
  private[graft] def unigramXentFromCounts(dt: DataFrame,
      rounded: Boolean = true): DataFrame = {
    val vocab = dt.groupBy("tok").agg(sum("cnt").as("c"))
    val total = vocab.agg(sum(col("c")).cast("double").as("n"))
    val raw = -sum(col("cnt") * (log(col("c")) - log(col("n")))) /
      sum(col("cnt"))
    dt.join(vocab, "tok")
      .crossJoin(broadcast(total))
      .groupBy("id")
      .agg(sum(col("cnt")).as("n_tok"),
        (if (rounded) round(raw, 4) else raw).as("xent"))
  }

  /** CCNet's perplexity buckets (Wenzek et al. 2020 §4.4): documents
    * band into `nBuckets` equal-mass bands (head / middle / tail for
    * the canonical 3) by their [[unigramXent]] score, with the band
    * CUTOFFS estimated on a deterministic [[sampleHash]] sample —
    * exactly how CCNet computes its percentile thresholds on a held-out
    * slice rather than sorting the whole crawl. Head (bucket 0) is the
    * most-fluent band; tail (`nBuckets - 1`) the least.
    *
    * Output: (id, n_tok, xent, bucket).
    *
    * Scale shape: the corpus-wide work is [[unigramXent]]'s (shared
    * tokenize pass, Zipf-bounded vocab join); cutoff estimation sorts
    * and collects ONLY the hash sample (bounded by `maxSample`, failed
    * loudly beyond — at crawl scale pick a rate giving a ~1e5-doc
    * sample, which pins cutoffs to ±0.3% band mass); assignment is a
    * literal-comparison chain, one narrow pass, zero extra shuffles —
    * never a global sort or a single-partition window over the corpus.
    *
    * Determinism/oracle parity: cutoffs compare the ROUNDED xent (the
    * 4-decimal value both engines agree on, margins spec-asserted) with
    * (xent, id) lexicographic tie-break, so band membership is a pure
    * function of the data.
    */
  def xentBuckets(df: DataFrame, idCol: String, textCol: String,
      sampleRate: Double = 0.2, nBuckets: Int = 3,
      maxSample: Int = 1 << 20): DataFrame = {
    require(nBuckets >= 2, s"need at least 2 buckets, got $nBuckets")
    require(sampleRate > 0 && sampleRate <= 1,
      s"sampleRate must be in (0, 1], got $sampleRate")
    val x = unigramXent(df, idCol, textCol)
    val thresh = (sampleRate * 4294967296d).toLong
    // bounded collect: the hash sample only, sorted once distributed
    val sample = x.filter(sampleHash(col("id")) < thresh)
      .select(col("xent"), col("id")).orderBy("xent", "id")
      .limit(maxSample + 1).collect()
    require(sample.length <= maxSample,
      s"xentBuckets sample exceeds maxSample=$maxSample — lower sampleRate")
    val m = sample.length
    require(m >= nBuckets,
      s"xentBuckets sample has $m docs < $nBuckets buckets — raise sampleRate")
    val cutoffs = (1 until nBuckets).map { j =>
      val r = sample(math.ceil(j.toDouble * m / nBuckets).toInt - 1)
      (r.getDouble(0), r.getLong(1))
    }
    val bucket = cutoffs.foldLeft(lit(0)) { case (acc, (xc, ic)) =>
      acc + when(col("xent") > xc ||
        (col("xent") === xc && col("id") > ic), 1).otherwise(0)
    }
    x.withColumn("bucket", bucket.cast("long"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): per-document log
    * importance ratio between a TARGET distribution (a trusted
    * high-quality subset, `isTarget`) and the RAW corpus, under
    * add-1-smoothed unigram LMs over the shared vocabulary —
    * `w(d) = Σ_tok cnt_{tok,d} · (ln p_t(tok) − ln p_r(tok))`. Taking
    * the top-weighted documents is DSIR's resampling in deterministic
    * top-k form (the paper adds Gumbel noise; a reproducible corpus
    * build wants a pure function of the data).
    *
    * Scale shape: both distributions aggregate from ONE shared
    * (id, tok, cnt) pass; the log-ratio table is vocab-sized and joins
    * back on the token key; totals are a 1-row broadcast. No driver
    * collect anywhere.
    *
    * Float parity: same measured-margin argument as [[unigramXent]] —
    * weights sit ≥ 2e-8 from their nearest 1e-4 rounding boundary and
    * the rank-100 selection gap is 4.3e-4 on the gate corpus, both
    * orders of magnitude above cross-engine fp divergence; the margin
    * is asserted mechanically in CorpusSpec ("rounding margins").
    */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column): DataFrame =
    dsirWeightsImpl(df, idCol, textCol, isTarget, rounded = true)

  /** [[dsirWeights]] with the rounding switchable off — see
    * [[unigramXentImpl]].
    */
  private[graft] def dsirWeightsImpl(df: DataFrame, idCol: String,
      textCol: String, isTarget: Column, rounded: Boolean): DataFrame =
    dsirWeightsFromCounts(docTokenCounts(df, idCol, textCol),
      df.filter(isTarget).select(col(idCol).as("id")), rounded)

  /** [[dsirWeights]] over a PRECOMPUTED (id, tok, cnt) table and an
    * explicit target-id set — see [[unigramXentFromCounts]].
    */
  private[graft] def dsirWeightsFromCounts(dt: DataFrame,
      tgtIds: DataFrame, rounded: Boolean = true): DataFrame = {
    val raw = dt.groupBy("tok").agg(sum("cnt").as("cr"))
    val tgt = dt.join(tgtIds, Seq("id"), "left_semi")
      .groupBy("tok").agg(sum("cnt").as("ct"))
    val vocab = raw.join(tgt, Seq("tok"), "left")
      .select(col("tok"), col("cr"), coalesce(col("ct"), lit(0L)).as("ct"))
    val totals = vocab.agg(
      sum(col("cr")).cast("double").as("nr"),
      sum(col("ct")).cast("double").as("nt"),
      count(lit(1)).cast("double").as("v"))
    val ratio = vocab.crossJoin(broadcast(totals))
      .select(col("tok"),
        (log(col("ct") + 1) - log(col("nt") + col("v")) -
          log(col("cr") + 1) + log(col("nr") + col("v"))).as("logratio"))
    val weight = sum(col("cnt") * col("logratio"))
    dt.join(ratio, "tok")
      .groupBy("id")
      .agg(sum(col("cnt")).as("n_tok"),
        (if (rounded) round(weight, 4) else weight).as("dsir_weight"))
  }

  /** Unigram-LM divergence between two corpora — the mix-monitoring
    * signal (is slice A drifting from slice B? does this week's crawl
    * match last week's?): KL(A‖B) and KL(B‖A) under add-1-smoothed
    * unigram LMs over the UNION vocabulary,
    * `KL(A‖B) = Σ_w p_a(w) · (ln p_a(w) − ln p_b(w))` with
    * `p_x(w) = (c_x(w)+1) / (N_x+V)`. Output is ONE row:
    * (n_tok_a, n_tok_b, vocab, kl_ab, kl_ba), divergences rounded to
    * 4 decimals (same cross-engine margin treatment as
    * [[unigramXent]] — asserted in CorpusSpec's margin spec).
    *
    * Scale shape: each side is one explode + one combine shuffle on
    * the token key; the union vocabulary is a full-outer join of two
    * Zipf-bounded count tables; totals ride in as a 1-row broadcast
    * and the divergences are one final aggregate — no driver collect.
    */
  def corpusDivergence(a: DataFrame, b: DataFrame, idCol: String,
      textCol: String): DataFrame =
    corpusDivergenceImpl(a, b, idCol, textCol, rounded = true)

  /** [[corpusDivergence]] with the rounding switchable off — see
    * [[unigramXentImpl]].
    */
  private[graft] def corpusDivergenceImpl(a: DataFrame, b: DataFrame,
      idCol: String, textCol: String, rounded: Boolean): DataFrame = {
    val ca = docTokenCounts(a, idCol, textCol)
      .groupBy("tok").agg(sum("cnt").as("ca"))
    val cb = docTokenCounts(b, idCol, textCol)
      .groupBy("tok").agg(sum("cnt").as("cb"))
    val vocab = ca.join(cb, Seq("tok"), "full_outer")
      .select(col("tok"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val totals = vocab.agg(
      sum(col("ca")).cast("double").as("na"),
      sum(col("cb")).cast("double").as("nb"),
      count(lit(1)).cast("double").as("v"))
    val pa = (col("ca") + 1) / (col("na") + col("v"))
    val pb = (col("cb") + 1) / (col("nb") + col("v"))
    val klAb = sum(pa * (log(pa) - log(pb)))
    val klBa = sum(pb * (log(pb) - log(pa)))
    vocab.crossJoin(broadcast(totals))
      .agg(sum(col("ca")).as("n_tok_a"), sum(col("cb")).as("n_tok_b"),
        count(lit(1)).as("vocab"),
        (if (rounded) round(klAb, 4) else klAb).as("kl_ab"),
        (if (rounded) round(klBa, 4) else klBa).as("kl_ba"))
  }

  /** Bigram-LM quality proxy — one rung up the n-gram ladder from
    * [[unigramXent]] toward CCNet's KenLM 5-gram stage (Wenzek et al.
    * 2020): each document's cross-entropy under the corpus's OWN
    * add-1-smoothed bigram LM,
    * `xent2(d) = -(1/B_d) Σ_{(w1,w2)} cnt · ln p(w2|w1)` with
    * `p(w2|w1) = (c(w1,w2)+1) / (c(w1,·)+V)` over the unigram
    * vocabulary size `V` and `B_d` the document's bigram occurrence
    * count. Unlike the unigram proxy, this scores WORD ORDER: shuffled
    * or templated token soup that happens to reuse common words now
    * pays for its unusual transitions.
    *
    * Scale shape: ONE tokenize pass feeds both the bigram explode and
    * the vocabulary count (the token-array base is lazily
    * checkpointed); bigram counts partial-aggregate map-side on slim
    * (w1, w2) keys; the context totals derive from the bigram table
    * (no second corpus pass); V rides in as a 1-row broadcast — no
    * driver collect. The bigram vocabulary is larger than the unigram
    * one but still far below corpus token mass (Zipf), and every join
    * is an AQE-broadcastable equi-join on gram keys.
    *
    * Float parity: same measured-margin discipline as [[unigramXent]]
    * — the emitted score is round(·, 4) and CorpusSpec's rounding-
    * margin spec asserts each value's distance to its nearest 1e-4
    * boundary stays orders of magnitude above cross-engine libm/
    * summation-order divergence, so corpus churn fails loudly there
    * rather than as an oracle hash mystery.
    */
  def bigramXent(df: DataFrame, idCol: String, textCol: String): DataFrame =
    bigramXentImpl(df, idCol, textCol, rounded = true)

  /** [[bigramXent]] with the rounding switchable off — see
    * [[unigramXentImpl]].
    */
  private[graft] def bigramXentImpl(df: DataFrame, idCol: String,
      textCol: String, rounded: Boolean): DataFrame = {
    val toks = filter(split(lower(trim(col(textCol))), "[ \\t\\n\\f\\r]+"),
      t => length(t) > 0)
    // one tokenize pass, shared (lazily checkpointed) by the bigram
    // explode and the vocabulary count
    val base = df.select(col(idCol).as("id"), toks.as("tk"))
      .localCheckpoint(false)
    val bg = base.filter(size(col("tk")) >= 2)
      .select(col("id"),
        explode(transform(sequence(lit(1), size(col("tk")) - 1),
          i => struct(element_at(col("tk"), i).as("w1"),
            element_at(col("tk"), i + 1).as("w2")))).as("b"))
      .select(col("id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("id", "w1", "w2").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false)
    val c12 = bg.groupBy("w1", "w2").agg(sum("cnt").as("c12"))
    val c1 = c12.groupBy("w1").agg(sum("c12").as("c1"))
    val v = base.select(explode(col("tk")).as("tok"))
      .agg(count_distinct(col("tok")).cast("double").as("v"))
    val raw = -sum(col("cnt") * (log(col("c12") + 1) - log(col("c1") + col("v")))) /
      sum(col("cnt"))
    bg.join(c12, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(v))
      .groupBy("id")
      .agg(sum(col("cnt")).as("n_bigram"),
        (if (rounded) round(raw, 4) else raw).as("xent2"))
  }

  // --- repetition statistics ----------------------------------------------

  /** Intra-document repetition profile over whitespace tokens:
    * `n_tok` total tokens, `n_distinct` distinct tokens, and `top_cnt`
    * (the highest single-token frequency). Duplication ratio
    * `(n_tok - n_distinct) / n_tok` and top-token dominance
    * `top_cnt / n_tok` derive from these exact integers — emitting the
    * integer numerators keeps the output hash-stable across engines
    * (no float rounding anywhere).
    *
    * Shape: tokens explode to slim (id, tok) rows, two partial-agg
    * shuffles on the id key — linear, skew-free (a single document's
    * tokens land in one group but documents are bounded).
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
        explode(filter(split(lower(trim(col(textCol))), "\\s+"),
          t => length(t) > 0)).as("tok"))
    toks.groupBy("id", "tok").agg(count(lit(1)).as("cnt"))
      .groupBy("id")
      .agg(sum(col("cnt")).as("n_tok"),
        count(lit(1)).as("n_distinct"),
        max(col("cnt")).as("top_cnt"))
  }

  /** N-gram repetition profile — the word-level half of Gopher's
    * repetition filters (Rae et al. 2021, table A1: duplicate n-gram
    * and top n-gram fractions): per document and per `n`, the total
    * n-gram occurrence count, the distinct count, and the top single
    * n-gram's occurrence count. The filter fractions derive from these
    * exact integers — `(total - n_distinct) / total` is the duplicate
    * n-gram fraction, `top_cnt / total` the top-n-gram dominance — and
    * emitting the integer numerators keeps the output hash-stable
    * across engines (no float rounding anywhere), the
    * [[repetitionStats]] convention.
    *
    * Single pass: every requested n explodes from one tokenize (an
    * n-literal explode, then a slice per position), so the text is
    * scanned once no matter how many n's are profiled. Two partial-agg
    * shuffles on slim keys, linear in corpus grams.
    */
  def ngramRepetition(df: DataFrame, idCol: String, textCol: String,
      ns: Seq[Int] = Seq(2, 3)): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), s"bad n list: $ns")
    val toks = filter(split(lower(trim(col(textCol))), "[ \\t\\n\\f\\r]+"),
      t => length(t) > 0)
    df.select(col(idCol).as("id"), toks.as("tk"))
      .select(col("id"), col("tk"),
        explode(array(ns.map(n => lit(n)): _*)).as("n")) // int literals -> int column
      .filter(size(col("tk")) >= col("n"))
      .select(col("id"), col("n"),
        explode(transform(sequence(lit(1), size(col("tk")) - col("n") + 1),
          i => array_join(slice(col("tk"), i, col("n")), " "))).as("gram"))
      .groupBy("id", "n", "gram").agg(count(lit(1)).as("c"))
      .groupBy("id", "n")
      .agg(sum(col("c")).as("total"), count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_cnt"))
  }

  /** Length-bucketed batch shaping for inference/training serving
    * (the sorted-batching rule every serving stack applies — batching
    * similar lengths minimizes padding waste): within each stratum,
    * documents sort by (token count desc, id) and chunk into batches
    * of `batchSize`; each batch pads to its LONGEST member. Emits one
    * row per batch: (stratum, batch_id, n_docs, max_tok, sum_tok,
    * pad_waste = n_docs·max_tok − sum_tok).
    *
    * All-integer arithmetic over one per-stratum sort window (slim
    * (id, n_tok) rows — the [[packSequences]] scale shape: per-stratum
    * parallelism, never a global sort), so a SQL oracle replays it
    * exactly.
    */
  def lengthBatches(df: DataFrame, idCol: String, stratumCol: String,
      tokCol: String, batchSize: Int): DataFrame = {
    require(batchSize > 0, s"lengthBatches: batchSize=$batchSize")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stratum"))
      .orderBy(col("n_tok").desc, col("id"))
    df.select(col(stratumCol).as("stratum"), col(idCol).as("id"),
        col(tokCol).cast("long").as("n_tok"))
      .withColumn("__rn", row_number().over(w))
      // integer `div`, not `/` (int/int is double in Spark SQL — the
      // packSequences rule)
      .withColumn("batch_id", expr(s"CAST((__rn - 1) div $batchSize AS BIGINT)"))
      .groupBy("stratum", "batch_id")
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_tok")).as("max_tok"),
        sum(col("n_tok")).as("sum_tok"))
      .withColumn("pad_waste",
        col("n_docs") * col("max_tok") - col("sum_tok"))
  }

  /** Per-stratum corpus datasheet (the "data card" table every corpus
    * release ships — Gebru et al., "Datasheets for Datasets", CACM
    * 2021): document count, token mass, mean tokens/doc, discrete
    * median and p90 of text length, and the stratum's share of the
    * corpus. One aggregation pass over narrow per-row stats.
    *
    * Length quantiles are DISCRETE order statistics — the sorted
    * group's element at 1-based index `ceil(q·n)` — not interpolated
    * `percentile`: the explicit index formula is replayed verbatim by
    * any SQL engine (`list_sort(list(x))[ceil(q*count(*))]`), so
    * cross-engine parity is exact by construction where continuous
    * interpolation would hinge on formula association. The sort
    * collects one group's lengths per task — groups are strata
    * (sources/languages), each far smaller than the corpus; mean and
    * share are exact integer ratios under round(,4).
    */
  def datasheet(df: DataFrame, textCol: String, stratumCol: String): DataFrame = {
    val base = df.select(col(stratumCol).as("stratum"),
      graft.functions.TextOps.wordCount(col(textCol)).cast("long").as("__nt"),
      length(col(textCol)).cast("long").as("__len"))
    val per = base.groupBy("stratum").agg(
      count(lit(1)).as("n_docs"),
      sum("__nt").as("n_tokens"),
      sort_array(collect_list(col("__len"))).as("__sorted"))
    def disc(q: Double) = element_at(col("__sorted"),
      ceil(lit(q) * col("n_docs")).cast("int"))
    val tot = per.agg(sum("n_docs").cast("double").as("__total"))
    per.crossJoin(broadcast(tot))
      .select(col("stratum"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("n_docs"), 4).as("mean_tok"),
        disc(0.5).as("p50_len"), disc(0.9).as("p90_len"),
        round(col("n_docs") / col("__total"), 4).as("share"))
  }

  // --- C4 cleaning heuristics (Raffel et al., JMLR 2020 §2.2) -------------

  /** Terminal-punctuation line rule: the line's last character is one of
    * `. ! ?` or a closing double quote (the C4 rule set).
    */
  private def c4LineTerminal(line: Column): Column =
    line.rlike("[.!?\"]$")

  /** The C4 web-page cleaning recipe over multi-line text, re-expressed
    * relationally (Raffel et al. 2020, §2.2 — the rules that produced
    * the C4 corpus from Common Crawl):
    *
    *  - a line is RETAINED iff it ends in a terminal punctuation mark
    *    (`.`/`!`/`?`/closing quote), has at least `minLineWords`
    *    whitespace words, and does not contain the word `javascript`
    *    (case-insensitive);
    *  - a PAGE is dropped iff it contains the phrase `lorem ipsum`
    *    (case-insensitive), contains a curly bracket `{`, or retains
    *    fewer than `minSentences` sentences. Sentences are counted as
    *    occurrences of `.`/`!`/`?` in the retained lines — the
    *    deterministic proxy both engines replay identically (the paper
    *    used a sentence splitter; any monotone proxy preserves the
    *    rule's character as a short-page gate).
    *
    * (The paper's fourth page rule — a bad-words blocklist — is the
    * [[Dedup.stopLineFilter]]-style broadcast anti-join and is left to
    * that operator family; this one covers the structural rules.)
    *
    * Scale shape: split lines with `posexplode`, per-line narrow
    * booleans, one `groupBy` on the UNIQUE doc id (unskewed by
    * construction, map-side combinable), text rebuilt with an ordered
    * in-group sort over positions bounded by the document's own line
    * count. Zero joins, one shuffle, fully oracle-replayable.
    *
    * Output: (id, n_lines, n_kept, n_sentences, has_lorem, has_brace,
    * kept_page, clean_text) — one row per input document, dropped pages
    * included with their verdict (the caller filters on `kept_page`;
    * keeping the rows makes the gate itself auditable and oracled).
    */
  def c4Clean(df: DataFrame, idCol: String, textCol: String,
      minLineWords: Int = 3, minSentences: Int = 5): DataFrame = {
    // null text coalesces to '' so the document still SURFACES (as one
    // empty dropped line, kept_page = false) — the one-row-per-input
    // contract is what makes the gate auditable; posexplode of a null
    // array would silently erase the row instead
    val text = coalesce(col(textCol), lit(""))
    val lines = df.select(col(idCol).as("id"),
        lower(text).contains("lorem ipsum").as("has_lorem"),
        text.contains("{").as("has_brace"),
        posexplode(split(text, "\n")).as(Seq("pos", "line")))
    val judged = lines.withColumn("__keep",
      c4LineTerminal(col("line")) &&
        size(filter(split(trim(col("line")), "[ \\t\\f\\r]+"),
          t => length(t) > 0)) >= minLineWords &&
        !lower(col("line")).rlike("\\bjavascript\\b"))
    judged.groupBy("id", "has_lorem", "has_brace")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("__keep"),
          size(regexp_extract_all(col("line"), lit("[.!?]"), lit(0))))
          .otherwise(0)).cast("long").as("n_sentences"),
        concat_ws("\n", transform(
          array_sort(collect_list(when(col("__keep"),
            struct(col("pos"), col("line"))))),
          s => s.getField("line"))).as("clean_text"))
      .select(col("id"), col("n_lines"), col("n_kept"), col("n_sentences"),
        col("has_lorem"), col("has_brace"),
        (!col("has_lorem") && !col("has_brace") &&
          col("n_sentences") >= minSentences).as("kept_page"),
        col("clean_text"))
  }
}
