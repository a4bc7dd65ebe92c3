package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter membership at corpus scale — the benchmark-too-big-to-
  * broadcast regime of [[Corpus.contamination]] (reference capability:
  * keeping eval/benchmark text out of the retrieval corpus the
  * reference's topics feed to the LLM, README.md:404-445; the filter
  * design is Bloom 1970 via Spark's own runtime-row-filtering sketch).
  *
  * [[Corpus.contamination]] broadcasts the benchmark's EXACT distinct
  * n-gram strings. That is the right plan while the benchmark is an
  * eval set (MBs). Decontaminating against a large held-out corpus — a
  * full prior training epoch, a licensed-content blocklist, another
  * lab's published eval suite in bulk — the exact gram set is tens of
  * GB and the plan degrades to a corpus-gram × benchmark-gram shuffle
  * join. The Bloom path restores the broadcast regime at any benchmark
  * size: an m-bit filter is built ONCE by a distributed OR-merge
  * aggregation (Spark's `BloomFilterAggregate`, the machinery behind
  * AQE runtime filters — partial filters merge associatively, so the
  * build is one pass with map-side combine and a single merged row),
  * and the probe is a NARROW codegen'd pass over corpus grams
  * (`BloomFilterMightContain`) — zero shuffle against the benchmark,
  * regardless of its size.
  *
  * Error model: one-sided. Every inserted gram probes TRUE (no false
  * negatives — a contaminated document can never slip through), and a
  * non-member probes TRUE with p ≈ (1 - e^{-kn/m})^k. For
  * DECONTAMINATION that is exactly the safe direction: the flagged set
  * is a slight superset of the true contamination, so false positives
  * cost a few clean documents, never a leaked eval item. Size `numBits`
  * for the benchmark's distinct-gram count (the standard m ≈ 14.4·n
  * gives p ≈ 0.1%); the filter bytes are a bounded INDEX ARTIFACT like
  * the IVF centroids/PQ codebooks — built once, persisted or held by
  * the driver, probed by every corpus shard.
  *
  * Determinism: the filter's set bits are an OR over per-element bit
  * positions — order- and partitioning-independent — and the hash is
  * seed-42 xxhash64 (the `functions.xxhash64` default) on both build
  * and probe sides, so the same
  * benchmark yields byte-identical filters on any cluster layout
  * (asserted in BloomSpec).
  */
object Bloom {

  /** Distributed build: Bloom filter over `xxhash64` of the values in
    * `valueCol`, returned as the serialized filter bytes (one bounded
    * driver row — the index-artifact collection step, like PQ codebook
    * training; NOT a per-row collect).
    */
  def build(df: DataFrame, valueCol: Column, expectedItems: Long,
      numBits: Long): Array[Byte] = {
    require(expectedItems > 0, s"bloom: expectedItems=$expectedItems")
    require(numBits > 0, s"bloom: numBits=$numBits")
    // Spark's BloomFilterAggregate SILENTLY clamps both parameters to
    // session ceilings (spark.sql.optimizer.runtime.bloomFilter.
    // maxNumBits / maxNumItems, defaults 2²⁶ bits / 4M items) — a
    // benchmark past the ceiling would quietly get a saturated filter
    // whose false-positive rate is percent-grade, defeating the sized
    // build's guarantee. Fail loudly and name the knob instead.
    // (GraftSession raises both ceilings; foreign sessions get told.)
    val conf = df.sparkSession.sessionState.conf
    val maxBits = conf.getConf(
      org.apache.spark.sql.internal.SQLConf.RUNTIME_BLOOM_FILTER_MAX_NUM_BITS)
    val maxItems = conf.getConf(
      org.apache.spark.sql.internal.SQLConf.RUNTIME_BLOOM_FILTER_MAX_NUM_ITEMS)
    require(numBits <= maxBits,
      s"bloom: numBits=$numBits exceeds the session ceiling $maxBits — " +
        "Spark would silently clamp the filter and degrade its " +
        "false-positive rate; raise spark.sql.optimizer.runtime." +
        "bloomFilter.maxNumBits (and expect a ~" +
        s"${numBits / 8 / (1 << 20)} MB driver-held artifact)")
    require(expectedItems <= maxItems,
      s"bloom: expectedItems=$expectedItems exceeds the session ceiling " +
        s"$maxItems — Spark would silently clamp it (skewing the derived " +
        "hash count); raise spark.sql.optimizer.runtime.bloomFilter." +
        "maxNumItems")
    val hashed = XxHash64(Seq(Shim.expression(valueCol)), 42L)
    val agg = new BloomFilterAggregate(hashed,
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val row = df.agg(Shim.column(agg).as("bloom")).head()
    // an EMPTY build side yields a null sketch; surface it as an empty
    // filter of the declared size so probes are well-defined (all-false)
    if (row.isNullAt(0)) {
      val bf = org.apache.spark.util.sketch.BloomFilter.create(expectedItems, numBits)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    } else row.getAs[Array[Byte]](0)
  }

  /** Probe column: TRUE iff `value`'s xxhash64 might be in the filter.
    * The filter rides as a foldable binary literal — the same shape
    * Spark's injected runtime filters use — so the probe stays inside
    * whole-stage codegen with the deserialized sketch cached per task.
    */
  def mightContain(bloomBytes: Array[Byte], value: Column): Column =
    Shim.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType),
      XxHash64(Seq(Shim.expression(value)), 42L)))

  /** Build a filter over the benchmark's distinct word `n`-grams — the
    * Bloom twin of [[Corpus.contamination]]'s broadcast gram set.
    */
  def buildGramBloom(benchmark: DataFrame, idCol: String, textCol: String,
      n: Int, expectedItems: Long, numBits: Long): Array[Byte] =
    build(
      Corpus.distinctGrams(benchmark, idCol, textCol, n)
        .select("gram").distinct(),
      col("gram"), expectedItems, numBits)

  /** [[buildGramBloom]] sized from the MEASURED distinct-gram count
    * instead of a caller-guessed capacity: a fixed `numBits` silently
    * degrades as the benchmark grows (the false-positive rate is a
    * function of the ACTUAL fill, not the declared one), so the sized
    * build counts the gram set once — the set is materialized anyway to
    * feed the filter aggregation, so the count is a bounded extra job
    * over an already-derived frame, paid once per offline artifact
    * build — and allocates `bitsPerItem` bits per measured gram.
    *
    * Sizing rule: `numBits = max(bitsPerItem · measured, 2²⁴)`. The
    * floor matters: Spark's sketch derives its k probe positions from
    * two 32-BIT hashes (Kirsch-Mitzenmacher double hashing), which
    * gives small filters a false-positive FLOOR the theoretical
    * `(1−e^{−kn/m})^k` does not predict — measured empirically against
    * 2·10⁷ random probes: n=1200 at 48 bits/item floors near 2.5·10⁻⁵
    * regardless of k, and the floor falls with ABSOLUTE filter size
    * (2¹⁸ bits → 3·10⁻⁶, 2²⁰ → 5·10⁻⁷, ≥2²² → below measurement).
    * 2²⁴ bits (2 MB — still a driver-held artifact) puts the floor
    * below 10⁻⁸ per probe, so the expected false-positive count stays
    * ≪ 1 up to ~10⁸ distinct corpus probe grams, and the linear term
    * keeps m/n ≥ 48 as the benchmark grows past 350k grams. Callers
    * screening larger corpora trade `bitsPerItem` up; 14.4 bits/item
    * is the classic 0.1% point when a superset is acceptable.
    */
  def buildGramBloomSized(benchmark: DataFrame, idCol: String,
      textCol: String, n: Int, bitsPerItem: Long = 48): Array[Byte] = {
    require(bitsPerItem >= 8, s"bloom: bitsPerItem=$bitsPerItem (need >= 8)")
    // lazy-checkpointed: the gram set feeds the count AND the filter
    // aggregation — derive it once, not twice
    val grams = Corpus.distinctGrams(benchmark, idCol, textCol, n)
      .select("gram").distinct().localCheckpoint(false)
    val measured = math.max(1L, grams.count())
    build(grams, col("gram"), measured,
      math.max(measured * bitsPerItem, 1L << 24))
  }

  /** Benchmark decontamination through a pre-built gram filter: per
    * candidate document, the number of its distinct `n`-grams that the
    * filter claims membership for; rows with `n_flagged >= minShared`
    * are contamination flags. Output `(id, n_flagged)`.
    *
    * Guarantee: `n_flagged >= n_shared` of the exact
    * [[Corpus.contamination]] for every document (no false negatives),
    * so the flagged set under any `minShared` is a superset of the
    * exact one. Scale shape: one narrow codegen'd probe pass over
    * corpus grams, then the same slim per-id count shuffle as the exact
    * operator — the benchmark contributes only the filter bytes.
    */
  def contaminationBloom(docs: DataFrame, idCol: String, textCol: String,
      bloomBytes: Array[Byte], n: Int = 4, minShared: Long = 1): DataFrame =
    Corpus.distinctGrams(docs, idCol, textCol, n)
      .filter(mightContain(bloomBytes, col("gram")))
      .groupBy("id").agg(count(lit(1)).as("n_flagged"))
      .filter(col("n_flagged") >= minShared)
}
