package graft

import org.apache.spark.sql.functions._
import graft.operators.Corpus

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("sampleHash lands in [0, 2^32) and is a pure function of the id") {
    val ids = spark.range(0, 10000).toDF("id")
    val h = ids.select(Corpus.sampleHash(col("id")).as("h"))
    val bounds = h.agg(min("h"), max("h")).head()
    assert(bounds.getLong(0) >= 0L && bounds.getLong(1) < 4294967296L)
    // stable across evaluations (no RNG state)
    val a = h.as[Long].collect().toSeq
    val b = ids.select(Corpus.sampleHash(col("id")).as("h")).as[Long].collect().toSeq
    assert(a == b)
  }

  test("stratified sample selects per-stratum rates, deterministically") {
    val docs = Tables(spark, sf, "documents")
    val sampled = Corpus.stratifiedSample(docs, "doc_id", "source",
      rates = Map("src0" -> 1.0, "src1" -> 0.0), defaultRate = 0.5)
    val bySrc = sampled.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val totals = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc("src0") == totals("src0"), "rate 1.0 keeps every row")
    assert(!bySrc.contains("src1"), "rate 0.0 keeps none")
    val defaultKept = bySrc.filterKeys(s => s != "src0" && s != "src1").values.sum
    val defaultTotal = totals.filterKeys(s => s != "src0" && s != "src1").values.sum
    val frac = defaultKept.toDouble / defaultTotal
    assert(frac > 0.3 && frac < 0.7, s"default 0.5 rate sampled frac=$frac")
    // re-running selects the identical subset
    val again = Corpus.stratifiedSample(docs, "doc_id", "source",
      rates = Map("src0" -> 1.0, "src1" -> 0.0), defaultRate = 0.5)
    assert(sampled.select("doc_id").as[Long].collect().sorted.toSeq ==
      again.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("redactPii replaces email, phone, url; email inside a url is url") {
    val df = Seq(
      (1L, "write to alice.smith+x@corp.example.org today"),
      (2L, "call 555-0142 now"),
      (3L, "docs at https://example.com/a?user=bob@mail.com rest"),
      (4L, "two mails a@b.io and c.d@e.co"),
      (5L, "clean text, no pii")).toDF("id", "text")
    val out = df.select(col("id"), Corpus.redactPii(col("text")).as("c"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "write to <EMAIL> today")
    assert(out(2L) == "call <PHONE> now")
    assert(out(3L) == "docs at <URL> rest", "url eats the embedded email")
    assert(out(4L) == "two mails <EMAIL> and <EMAIL>")
    assert(out(5L) == "clean text, no pii")
  }

  test("piiCounts counts each kind") {
    val df = Seq((1L, "a@b.io c@d.io 555-1234 https://x.org")).toDF("id", "text")
    val (e, p, u) = Corpus.piiCounts(col("text"))
    val r = df.select(e.as("e"), p.as("p"), u.as("u")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 1L, 1L)))
  }

  test("contamination flags a doc sharing an n-gram with the benchmark") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("id", "text")
    val docs = Seq(
      (1L, "prefix words then the quick brown fox appears here"),
      (2L, "completely unrelated text with no overlap at all")).toDF("id", "text")
    val flagged = Corpus.contamination(docs, bench, "id", "text", n = 4, minShared = 1)
      .as[(Long, Long)].collect().toMap
    assert(flagged.contains(1L) && flagged(1L) >= 1L)
    assert(!flagged.contains(2L))
  }

  test("repetitionStats: exact integer profile") {
    val df = Seq((1L, "a a a b b c"), (2L, "x y z")).toDF("id", "text")
    val r = Corpus.repetitionStats(df, "id", "text")
      .as[(Long, Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r(1L) == ((6L, 3L, 3L)), "6 tokens, 3 distinct, top count 3")
    assert(r(2L) == ((3L, 3L, 1L)))
  }

  test("tokenBudget fills each stratum up to the budget in hash order") {
    val df = Seq(
      (1L, "a", 900L), (2L, "a", 900L), (3L, "a", 900L), (4L, "a", 900L),
      (10L, "b", 500L)).toDF("id", "src", "n_tok")
    val kept = Corpus.tokenBudget(df, "id", "src", "n_tok", budget = 2000L)
    val byStratum = kept.groupBy("src")
      .agg(count(lit(1)).as("n"), sum("n_tok").as("tot"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byStratum("a") == ((2L, 1800L)), "exactly 2 of the 900-token docs fit in 2000")
    assert(byStratum("b") == ((1L, 500L)))
    // deterministic: same subset on re-run
    val again = Corpus.tokenBudget(df, "id", "src", "n_tok", budget = 2000L)
    assert(kept.select("id").as[Long].collect().sorted.toSeq ==
      again.select("id").as[Long].collect().sorted.toSeq)
  }

  test("recallContract: per-query boolean against the exact twin") {
    import graft.operators.VectorSearch
    val queries = Seq((1L, "x"), (2L, "x")).toDF("qid", "ignore")
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L)).toDF("qid", "mid")
    val approx = Seq((1L, 10L), (1L, 99L), (2L, 98L), (2L, 99L)).toDF("qid", "mid")
    val r = VectorSearch.recallContract(approx, exact, queries, "qid", "mid", 1)
      .as[(Long, Boolean)].collect().toMap
    assert(r(1L), "query 1 retrieved one true match")
    assert(!r(2L), "query 2 retrieved none")
  }

  test("null and empty text: curation ops degrade without throwing") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "   "),
      (4L, "real text here")).toDF("id", "text")
    // redaction passes nulls through, leaves clean text alone
    val red = df.select(col("id"), Corpus.redactPii(col("text")).as("c"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(red(1L).isEmpty && red(2L).contains("") && red(4L).contains("real text here"))
    // repetition stats: null/empty/blank docs vanish (no tokens), real stays
    val rep = Corpus.repetitionStats(df, "id", "text")
      .select("id").as[Long].collect().toSet
    assert(rep == Set(4L))
    // grams: nothing shorter than n survives
    assert(Corpus.distinctGrams(df, "id", "text", 3).count() == 1)
  }

  test("null and empty text: r8 line/span/mixture ops degrade without throwing") {
    import graft.operators.Dedup
    val df = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "   "),
      (4L, "real text here and more real text here again yes ok fine now"),
      (5L, "real text here and more real text here again yes ok fine now"))
      .toDF("id", "text")
    // span scrub: token-less docs vanish; the dup doc pair still scrubs
    val scrub = Dedup.removeDuplicateSpans(df, "id", "text", n = 8, minDocs = 2)
      .select("id").as[Long].collect().toSet
    assert(scrub == Set(4L, 5L))
    // line ops: null text drops the doc (split(null) explodes nothing);
    // empty/blank docs keep their single blank line
    val ld = Dedup.lineDedup(df, "id", "text").select("id")
      .as[Long].collect().toSet
    assert(ld == Set(2L, 3L, 4L))
    val sl = Dedup.stopLineFilter(df, "id", "text",
      Seq("never present").toDF("key")).select("id").as[Long].collect().toSet
    assert(sl == Set(2L, 3L, 4L, 5L))
    // temperature sampling: a null stratum has no configured rate and
    // falls to the 0.0 default — dropped, not thrown
    val strat = Seq((1L, "A"), (2L, "A"), (3L, null.asInstanceOf[String]))
      .toDF("id", "s")
    val kept = Corpus.temperatureSample(strat, "id", "s", alpha = 0.5,
      targetRows = 2).select("id").as[Long].collect().toSet
    assert(!kept.contains(3L))
  }

  test("corner cases: empty benchmark, zero budget, negative ids") {
    val docs = Seq((1L, "some real text here for the test")).toDF("id", "text")
    val emptyBench = Seq.empty[(Long, String)].toDF("id", "text")
    assert(Corpus.contamination(docs, emptyBench, "id", "text").count() == 0)
    val toks = Seq((1L, "a", 5L)).toDF("id", "src", "n_tok")
    assert(Corpus.tokenBudget(toks, "id", "src", "n_tok", budget = 0L).count() == 0)
    // negative ids still hash into [0, 2^32): pmod, not %
    val negs = Seq(-1L, -42L, Long.MinValue).toDF("id")
      .select(Corpus.sampleHash(col("id")).as("h")).as[Long].collect()
    assert(negs.forall(h => h >= 0L && h < 4294967296L), negs.mkString(","))
  }

  test("distinctGrams emits each n-gram once per doc") {
    val df = Seq((1L, "a b a b a b")).toDF("id", "text")
    val grams = Corpus.distinctGrams(df, "id", "text", 2)
      .select("gram").as[String].collect().sorted.toSeq
    assert(grams == Seq("a b", "b a"))
  }

  test("assignSplits: stable banded membership, exhaustive and disjoint") {
    val docs = Tables(spark, sf, "documents").select(col("doc_id"), col("source"))
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Corpus.assignSplits(docs, "doc_id", splits)
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet.subsetOf(Set("train", "val", "test")))
    assert(got.values.sum == docs.count())
    // roughly proportional (hash-uniform; generous bounds at n=500)
    assert(got("train") > got.values.sum * 6 / 10)
    // stable under repartition: identical assignment per id
    val a = Corpus.assignSplits(docs, "doc_id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = Corpus.assignSplits(docs.repartition(9), "doc_id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a == b)
    intercept[IllegalArgumentException](
      Corpus.assignSplits(docs, "doc_id", Seq("a" -> 0.9, "b" -> 0.2)))
  }

  test("takePerStratum: exact counts, deterministic membership") {
    val docs = Tables(spark, sf, "documents").select(col("doc_id"), col("source"))
    val got = Corpus.takePerStratum(docs, "doc_id", "source", n = 7)
    val perStratum = got.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val available = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perStratum.foreach { case (s2, n2) => assert(n2 == math.min(7L, available(s2))) }
    // the carve-out is a prefix of the hash order: re-running with a
    // larger n strictly extends it
    val ids7 = got.collect().map(_.getLong(0)).toSet
    val ids9 = Corpus.takePerStratum(docs, "doc_id", "source", n = 9)
      .collect().map(_.getLong(0)).toSet
    assert(ids7.subsetOf(ids9))
  }

  test("packSequences: contiguous chunking invariants hold per stratum") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("source"),
        graft.functions.TextOps.tokenCountWs(col("text")).cast("long").as("n_tok"))
    val plan = Corpus.packSequences(docs, "doc_id", "source", "n_tok", seqLen = 128L)
      .collect()
    assert(plan.length == docs.count())
    plan.foreach { r =>
      val (tok, pid, off) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(pid >= 0 && off >= 0 && off < 128)
      // crosses is exactly "doesn't fit in the remainder"
      assert(r.getBoolean(5) == (off + tok > 128))
    }
    // per stratum: positions reconstruct a gapless concatenation — the
    // farthest document's END position (pack_id*128 + offset + n_tok)
    // equals the stratum's total token count
    plan.groupBy(_.getString(1)).foreach { case (_, rows) =>
      val totalTok = rows.map(_.getLong(2)).sum
      val maxEnd = rows.map(r => r.getLong(3) * 128 + r.getLong(4) + r.getLong(2)).max
      assert(maxEnd == totalTok, s"gap: maxEnd=$maxEnd total=$totalTok")
    }
    // determinism: repartitioned input yields the identical plan
    val again = Corpus.packSequences(docs.repartition(13), "doc_id", "source",
      "n_tok", seqLen = 128L).collect()
    assert(plan.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("unigramXent matches the hand-computed MLE cross-entropy") {
    // corpus: d1 = "a a b", d2 = "b b" → vocab a:2 b:3, N=5
    // xent(d1) = -(2·ln(2/5) + ln(3/5))/3 = 0.7811
    // xent(d2) = -ln(3/5) = 0.5108
    val docs = Seq((1L, "a A  b"), (2L, "b\tb")).toDF("id", "text")
    val out = Corpus.unigramXent(docs, "id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == ((3L, 0.7811)))
    assert(out(2L) == ((2L, 0.5108)))
    // ordering property on the real corpus: a doc made of the corpus's
    // most common tokens must score strictly lower than one made of
    // tokens that appear nowhere else
    val real = Tables(spark, sf, "documents").select("doc_id", "text")
      .unionByName(Seq((900001L, "the and of to the and of to"),
        (900002L, "zqxj kvwpt mbrgh zzyzx qqqqv wwwwk eeeej rrrrq"))
        .toDF("doc_id", "text"))
    val scored = Corpus.unigramXent(real, "doc_id", "text")
      .filter(col("id") >= 900001L)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(scored(900001L) < scored(900002L),
      s"common-word doc ${scored(900001L)} should beat rare-word doc ${scored(900002L)}")
  }

  test("bigramXent matches the hand-computed add-1 conditional cross-entropy") {
    // corpus: d1 = "a b a", d2 = "b b b" → bigrams c12(a,b)=1, c12(b,a)=1,
    // c12(b,b)=2; contexts c1(a)=1, c1(b)=3; unigram vocab V=2
    // xent2(d1) = -(ln(2/3) + ln(2/5))/2 = 0.6609
    // xent2(d2) = -(2·ln(3/5))/2 = 0.5108
    val docs = Seq((1L, "a  B a"), (2L, "b\tb b")).toDF("id", "text")
    val out = Corpus.bigramXent(docs, "id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == ((2L, 0.6609)))
    assert(out(2L) == ((2L, 0.5108)))
    // single-token and empty docs have no bigrams and must not appear
    val sparse = Seq((1L, "a b"), (2L, "lonely"), (3L, "  ")).toDF("id", "text")
    assert(Corpus.bigramXent(sparse, "id", "text")
      .select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("bigramXent is order-sensitive where unigramXent cannot be") {
    // same token multiset, opposite order: the unigram proxy scores them
    // identically; the bigram proxy penalizes the unseen transitions
    val docs = ((1L to 5L).map(i => (i, "new york city")) ++
      Seq((10L, "new york city"), (11L, "city york new"))).toDF("id", "text")
    val bx = Corpus.bigramXent(docs, "id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(bx(10L) < bx(11L),
      s"natural order ${bx(10L)} must beat shuffled ${bx(11L)}")
    val ux = Corpus.unigramXent(docs, "id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(ux(10L) == ux(11L), "unigram xent is order-blind by construction")
  }

  test("dsirWeights matches the hand-computed smoothed log-ratio") {
    // target = {1}; d1 = "x x y", d2 = "y z"
    // raw x:2 y:2 z:1 (Nr=5), tgt x:2 y:1 z:0 (Nt=3), V=3
    // w(1) = 2·ln(4/3) + ln(8/9) = 0.4576 ; w(2) = ln(8/9) + ln(2/3) = -0.5232
    val docs = Seq((1L, "x x y", true), (2L, "y z", false))
      .toDF("id", "text", "is_tgt")
    val out = Corpus.dsirWeights(docs, "id", "text", col("is_tgt"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == ((3L, 0.4576)))
    assert(out(2L) == ((2L, -0.5232)))
    // on the real corpus with the English slice as target, English docs
    // must average a higher importance weight than the rest
    val real = Tables(spark, sf, "documents")
    val w = Corpus.dsirWeights(real, "doc_id", "text", col("lang") === "en")
      .join(real.select(col("doc_id").as("id"), col("lang")), "id")
    val means = w.groupBy(col("lang") === "en")
      .agg(avg("dsir_weight")).as[(Boolean, Double)].collect().toMap
    assert(means(true) > means(false),
      s"en mean ${means(true)} should exceed non-en mean ${means(false)}")
  }

  test("ngramRepetition matches hand-counted totals, distincts, tops") {
    // "a b a b a": 2-grams [a b, b a, a b, b a] -> total 4, distinct 2,
    // top 2; 3-grams [a b a, b a b, a b a] -> total 3, distinct 2, top 2
    val docs = Seq((1L, "a B a b A"), (2L, "x y")).toDF("id", "text")
    val out = Corpus.ngramRepetition(docs, "id", "text", ns = Seq(2, 3))
      .as[(Long, Int, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(out((1L, 2)) == ((4L, 2L, 2L)))
    assert(out((1L, 3)) == ((3L, 2L, 2L)))
    assert(out((2L, 2)) == ((1L, 1L, 1L)))
    assert(!out.contains((2L, 3)), "doc shorter than n emits no row")
  }

  test("boilerplate gram mining: doc frequency counts distinct docs, ties on gram") {
    // "c c c" appears in docs 1-3 (twice in doc 1 — counted once),
    // "a b z" only in doc 4
    val docs = Seq(
      (1L, "c c c c"), (2L, "x c c c"), (3L, "c c c y"), (4L, "a b z"))
      .toDF("id", "text")
    val top = Corpus.distinctGrams(docs, "id", "text", 3)
      .groupBy("gram").agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("gram"))
      .limit(3).as[(String, Long)].collect().toSeq
    // exact top-3: doc_freq desc, then gram asc breaks the 1-freq tie
    // ("a b z" < "c c y" < "x c c" lexicographically)
    assert(top == Seq(("c c c", 3L), ("a b z", 1L), ("c c y", 1L)))
  }

  test("corpusDivergence matches the hand-computed smoothed KL") {
    val a = Seq((1L, "a a b")).toDF("id", "text")
    val b = Seq((2L, "b c")).toDF("id", "text")
    val r = Corpus.corpusDivergence(a, b, "id", "text")
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(r._1 == 3L && r._2 == 2L && r._3 == 3L)
    // recompute the add-1 smoothed KLs over the 3-token union vocab
    def p(c: Long, n: Double) = (c + 1) / (n + 3.0)
    val ca = Map("a" -> 2L, "b" -> 1L, "c" -> 0L)
    val cb = Map("a" -> 0L, "b" -> 1L, "c" -> 1L)
    val klAb = ca.keys.map(k =>
      p(ca(k), 3) * (math.log(p(ca(k), 3)) - math.log(p(cb(k), 2)))).sum
    val klBa = ca.keys.map(k =>
      p(cb(k), 2) * (math.log(p(cb(k), 2)) - math.log(p(ca(k), 3)))).sum
    assert(math.abs(r._4 - klAb) <= 5.1e-5, s"kl_ab ${r._4} vs $klAb")
    assert(math.abs(r._5 - klBa) <= 5.1e-5, s"kl_ba ${r._5} vs $klBa")
    // KL is asymmetric and positive for these distinct corpora
    assert(r._4 > 0 && r._5 > 0 && r._4 != r._5)
  }

  test("temperatureSample flattens a skewed mixture deterministically") {
    // stratum A dominates 16:1; alpha = 0.5 upsamples B relative to A
    val df = ((1L to 160L).map(i => (i, "A")) ++ (1001L to 1010L).map(i => (i, "B")))
      .toDF("id", "s")
    val out = Corpus.temperatureSample(df, "id", "s", alpha = 0.5,
      targetRows = 50)
    val byStratum = out.groupBy("s").count()
      .as[(String, Long)].collect().toMap
    // hand-derived rates: w_A = round(sqrt(160)) = 13, w_B = 3, sw = 16
    // -> rate_A = 50*13/16/160 ~ 0.254, rate_B = 50*3/16/10 ~ 0.938:
    // B keeps nearly everything, A keeps roughly a quarter
    val fracA = byStratum.getOrElse("A", 0L).toDouble / 160
    val fracB = byStratum.getOrElse("B", 0L).toDouble / 10
    assert(fracB > fracA, s"tail stratum not upsampled: A=$fracA B=$fracB")
    assert(fracB >= 0.7 && fracA <= 0.45, s"rates off: A=$fracA B=$fracB")
    // pure function of the id: identical membership on a second run
    val again = Corpus.temperatureSample(df, "id", "s", alpha = 0.5,
      targetRows = 50).select("id").as[Long].collect().toSet
    assert(again == out.select("id").as[Long].collect().toSet)
    // alpha = 1 preserves natural proportions: every stratum samples at
    // the same uniform rate T/N (w_s = n_s, so rate = T/N everywhere)
    val nat = Corpus.temperatureSample(df, "id", "s", alpha = 1.0,
      targetRows = 50)
    assert(nat.count() > 0)
  }

  test("rounding margins: no xent/dsir value sits near a 1e-4 boundary") {
    // The oracle gate emits round(x, 4) doubles and relies on the
    // UNROUNDED value sitting far from every k+0.5 (in 1e-4 units)
    // rounding boundary relative to cross-engine fp divergence
    // (~1e-12 over these term counts). The margins were measured on
    // the seed-pinned corpus; this assertion mechanizes them, so a
    // regenerated corpus (FIXTURES.md records that the driver DOES
    // regenerate parquet) fails HERE with a named cause instead of as
    // a mysterious CORRECTNESS hash mismatch. Asserted on the sf0.01
    // gate corpus — the one the driver's DuckDB compare actually runs.
    def boundaryDist(v: Double): Double = {
      val scaled = v * 1e4
      math.abs(scaled - math.floor(scaled) - 0.5) * 1e-4
    }
    val gateDir = "/root/testdata/sf0.01"
    assume(new java.io.File(gateDir).isDirectory)
    val docs = Tables(spark, gateDir, "documents")
    val xm = Corpus.unigramXentImpl(docs, "doc_id", "text", rounded = false)
      .select("xent").as[Double].collect().map(boundaryDist).min
    assert(xm >= 1e-9,
      f"unigram-xent value within $xm%.2e of a 1e-4 rounding boundary — " +
        "the corpus generator churned; re-measure margins or drop the " +
        "oracle to 2 decimals before the hash gate flips")
    val dm = Corpus.dsirWeightsImpl(docs, "doc_id", "text",
        col("lang") === "en", rounded = false)
      .select("dsir_weight").as[Double].collect().map(boundaryDist).min
    assert(dm >= 1e-9,
      f"dsir weight within $dm%.2e of a 1e-4 rounding boundary — " +
        "the corpus generator churned; re-measure margins or drop the " +
        "oracle to 2 decimals before the hash gate flips")
    val bm = Corpus.bigramXentImpl(docs, "doc_id", "text", rounded = false)
      .select("xent2").as[Double].collect().map(boundaryDist).min
    assert(bm >= 1e-9,
      f"bigram-xent value within $bm%.2e of a 1e-4 rounding boundary — " +
        "the corpus generator churned; see the unigram note above")
    val kl = Corpus.corpusDivergenceImpl(
        docs.filter(col("lang") === "en"),
        docs.filter(col("lang") =!= "en"), "doc_id", "text",
        rounded = false)
      .select("kl_ab", "kl_ba").as[(Double, Double)].collect().head
    val km = Seq(kl._1, kl._2).map(boundaryDist).min
    assert(km >= 1e-9,
      f"corpus divergence within $km%.2e of a 1e-4 rounding boundary — " +
        "the corpus generator churned; see the xent note above")
  }

  test("composed curation pipeline: stage invariants hold end-to-end") {
    val out = SparkEntry.queries("q_curation_pipeline")(spark, sf).collect()
    assert(out.nonEmpty, "pipeline produced no training docs")
    val docs = Tables(spark, sf, "documents")
    // survivors are train-split members of the deduped quality gate:
    // every survivor must be a real doc with >= 20 words
    val ids = out.map(_.getLong(0)).toSet
    val words = docs.select(col("doc_id"),
        graft.functions.TextOps.wordCount(col("text")).as("w"))
      .as[(Long, Int)].collect().toMap
    ids.foreach(id => assert(words(id) >= 20, s"doc $id under the word gate"))
    // the token budget holds per source
    out.groupBy(_.getString(1)).foreach { case (src, rows) =>
      val tot = rows.map(_.getLong(2)).sum
      assert(tot <= 3000L, s"source $src exceeds budget: $tot")
    }
    // packing invariants (offset within the sequence, crosses consistent)
    out.foreach { r =>
      assert(r.getLong(4) >= 0 && r.getLong(4) < 256)
      assert(r.getBoolean(5) == (r.getLong(4) + r.getLong(2) > 256))
    }
  }

  test("semanticDecontaminate: survivors have no benchmark neighbor at threshold") {
    val emb = Tables(spark, sf, "embeddings")
    val train = emb.filter(col("vec_id") % 5 =!= 0)
    val bench = emb.filter(col("vec_id") % 5 === 0)
    val thr = 0.35
    val surv = Corpus.semanticDecontaminate(train, bench, "vec_id", "embedding", thr)
    assert(surv.columns.sameElements(train.columns), "schema unchanged")
    val survIds = surv.select("vec_id").as[Long].collect().toSet
    // brute-force ground truth: exact max cosine against the bench side
    val benchRows = bench.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect()
    val trainRows = train.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0f; var aa = 0.0f; var bb = 0.0f
      var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i); i += 1
      }
      (dot / (math.sqrt(aa).toFloat * math.sqrt(bb).toFloat)).toDouble
    }
    trainRows.foreach { case (id, v) =>
      val contaminated = benchRows.exists { case (_, bv) => cos(v, bv) >= thr }
      assert(survIds.contains(id) == !contaminated,
        s"doc $id: contaminated=$contaminated but kept=${survIds.contains(id)}")
    }
    assert(survIds.size < trainRows.length, "threshold 0.35 must flag something")
    // a threshold above any possible cosine keeps everything
    assert(Corpus.semanticDecontaminate(train, bench, "vec_id", "embedding",
      1.01).count() == trainRows.length)
  }

  test("xentBuckets: bands are xent-monotone, near-equal mass, deterministic") {
    val docs = Tables(spark, sf, "documents")
    val out = Corpus.xentBuckets(docs, "doc_id", "text",
      sampleRate = 0.2, nBuckets = 3)
      .select(col("id"), col("xent"), col("bucket"))
      .as[(Long, Double, Long)].collect()
    assert(out.map(_._3).toSet.subsetOf(Set(0L, 1L, 2L)))
    // monotone: sort by (xent, id) -> bucket never decreases
    val sorted = out.sortBy(t => (t._2, t._1))
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(a._3 <= b._3,
        s"bucket order violated between ${a._1} and ${b._1}")
      case _ => ()
    }
    // sample-estimated bands are near-equal mass (within 2x of n/3 here)
    val sizes = out.groupBy(_._3).view.mapValues(_.length)
    assert(sizes.size == 3, s"missing bands: $sizes")
    sizes.foreach { case (b, n) =>
      assert(n >= out.length / 6, s"band $b degenerate: $n of ${out.length}")
    }
    // deterministic: a second run reproduces membership bit-for-bit
    val again = Corpus.xentBuckets(docs, "doc_id", "text",
      sampleRate = 0.2, nBuckets = 3)
      .select(col("id"), col("bucket")).as[(Long, Long)].collect().toMap
    out.foreach { case (id, _, b) => assert(again(id) == b) }
    // arg validation fails loudly
    intercept[IllegalArgumentException] {
      Corpus.xentBuckets(docs, "doc_id", "text", nBuckets = 1)
    }
    intercept[IllegalArgumentException] {
      Corpus.xentBuckets(docs, "doc_id", "text", sampleRate = 0.0)
    }
  }

  test("chunkTokens: coverage, overlap, and chunk-count law") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),     // 10 toks: fits in one 8-chunk? no: size 8
      (2L, "one two three"),            // fits whole
      (3L, ""),                         // token-less -> vanishes
      (4L, "  x  "),                    // 1 token with padding
      (5L, (1 to 25).map(i => s"t$i").mkString(" "))) // 25 toks
      .toDF("id", "text")
    val size = 8; val ov = 3; val stride = size - ov
    val out = Corpus.chunkTokens(docs, "id", "text", size, ov)
      .orderBy("id", "chunk_id")
      .as[(Long, Long, Long, String)].collect()
    assert(!out.exists(_._1 == 3L), "empty doc must vanish")
    // chunk-count law: 1 if n <= size else ceil((n - size) / stride) + 1
    val counts = out.groupBy(_._1).view.mapValues(_.length).toMap
    def law(n: Int) = if (n <= size) 1 else math.ceil((n - size).toDouble / stride).toInt + 1
    assert(counts(1L) == law(10) && counts(2L) == law(3) &&
      counts(4L) == law(1) && counts(5L) == law(25))
    // doc 5: every token covered, consecutive chunks share `ov` tokens
    val c5 = out.filter(_._1 == 5L).sortBy(_._2)
    val toks5 = (1 to 25).map(i => s"t$i")
    c5.foreach { case (_, cid, ntok, text) =>
      val expect = toks5.slice((cid * stride).toInt,
        (cid * stride).toInt + size)
      assert(text == expect.mkString(" "), s"chunk $cid text")
      assert(ntok == expect.length, s"chunk $cid n_chunk_tok")
    }
    val covered = c5.flatMap { case (_, cid, ntok, _) =>
      (cid * stride) until (cid * stride + ntok) }.toSet
    assert(covered == (0 until 25).toSet, "full token coverage")
    c5.sliding(2).foreach {
      case Array((_, _, n1, t1), (_, _, _, t2)) if n1 == size =>
        assert(t1.split(" ").takeRight(ov).sameElements(t2.split(" ").take(ov)),
          "consecutive chunks share exactly the overlap tokens")
      case _ => ()
    }
    // boundary: n == size -> exactly one chunk; n == size + 1 -> two
    val edge = Seq((1L, (1 to size).mkString(" ")),
      (2L, (1 to size + 1).mkString(" "))).toDF("id", "text")
    val ec = Corpus.chunkTokens(edge, "id", "text", size, ov)
      .groupBy("id").count().as[(Long, Long)].collect().toMap
    assert(ec(1L) == 1 && ec(2L) == 2)
  }

  test("chunkTokens composes with the embedder: a chunk retrieves itself") {
    val docs = Tables(spark, sf, "documents").limit(30)
    val chunks = Corpus.chunkTokens(docs, "doc_id", "text", 32, 8)
      .withColumn("cid",
        col("id") * 1000 + col("chunk_id")) // unique per chunk
      .withColumn("emb", graft.functions.HashEmbedder.embedCol(col("chunk_text")))
    val probe = chunks.orderBy("cid").limit(5)
      .select(col("cid").as("query_id"), col("emb").as("qv"),
        col("chunk_text").as("qtext"))
    val hits = graft.operators.VectorSearch.topKFlat(
      probe, "query_id", "qv", chunks, "cid", "emb", k = 1, metric = "cosine")
    val texts = chunks.select("cid", "chunk_text")
      .as[(Long, String)].collect().toMap
    val top = hits.filter(col("rank") === 1)
      .select("query_id", "match_id").as[(Long, Long)].collect().toMap
    top.foreach { case (q, m) =>
      // identical chunk TEXT (the synthetic corpus repeats phrases, so a
      // byte-identical chunk elsewhere legitimately ties at cosine 1.0)
      assert(texts(q) == texts(m),
        s"chunk $q should retrieve its own text at rank 1, got chunk $m")
    }
  }

  test("chunk -> embed -> groupMaxSim retrieves the chunk's own document") {
    // the composed multi-vector layout: documents chunk, chunks embed,
    // and retrieval ranks DOCUMENTS by their best chunk (late
    // interaction) — a query made from one chunk's text must rank its
    // source document first (ties only with byte-identical chunks)
    val docs = Tables(spark, sf, "documents").limit(40)
    val chunks = Corpus.chunkTokens(docs, "doc_id", "text", 32, 8)
      .withColumn("emb", graft.functions.HashEmbedder.embedCol(col("chunk_text")))
    val probe = chunks.filter(col("chunk_id") === 1) // mid-doc chunks
      .orderBy("id").limit(5)
      .select(col("id").as("query_id"), col("emb").as("qv"),
        col("chunk_text").as("qtext"))
    val got = graft.operators.VectorSearch.groupMaxSimTopK(
        probe, "query_id", "qv", chunks, "id", "emb", k = 1)
      .as[(Long, Long, Int)].collect()
    assert(got.nonEmpty)
    val texts = chunks.select(col("id"), col("chunk_text"))
      .as[(Long, String)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val probes = probe.select(col("query_id"), col("qtext"))
      .as[(Long, String)].collect().toMap
    got.foreach { case (qid, grp, _) =>
      // the winning document must contain the probe chunk's text
      // byte-identically (self, or a legitimate exact-duplicate chunk)
      assert(texts(grp).contains(probes(qid)),
        s"query $qid retrieved doc $grp lacking its chunk")
    }
  }

  test("datasheet: counts, means, discrete quantiles, shares on a fixed corpus") {
    // stratum a: lengths 1,2,3,10 (texts of that many chars) — n=4:
    //   p50 idx ceil(0.5*4)=2 -> 2; p90 idx ceil(0.9*4)=4 -> 10
    // stratum b: single doc of 5 tokens
    val docs = Seq(
      (1L, "x", "a"), (2L, "xy", "a"), (3L, "xyz", "a"), (4L, "abcdefghij", "a"),
      (5L, "t t t t t", "b")).toDF("id", "text", "src")
    val got = Corpus.datasheet(docs, "text", "src")
      .as[(String, Long, Long, Double, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val a = got("a")
    assert(a._2 == 4 && a._3 == 1 + 1 + 1 + 1) // each text is one ws token
    assert(a._4 == 1.0)
    assert(a._5 == 2L && a._6 == 10L)
    assert(a._7 == 0.8)
    val b = got("b")
    assert(b._2 == 1 && b._3 == 5 && b._4 == 5.0)
    assert(b._5 == 9L && b._6 == 9L) // "t t t t t".length == 9
    assert(b._7 == 0.2)
  }

  test("lengthBatches: sorted batching, exact padding arithmetic") {
    // stratum a: token counts 5,4,3,1 at batchSize 2 ->
    //   batch 0: {5,4} max 5 sum 9 waste 1; batch 1: {3,1} max 3 sum 4 waste 2
    val docs = Seq(
      (1L, "a", 5L), (2L, "a", 4L), (3L, "a", 3L), (4L, "a", 1L),
      (5L, "b", 7L)).toDF("id", "src", "nt")
    val got = Corpus.lengthBatches(docs, "id", "src", "nt", batchSize = 2)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got(("a", 0L)) == ("a", 0L, 2L, 5L, 9L, 1L))
    assert(got(("a", 1L)) == ("a", 1L, 2L, 3L, 4L, 2L))
    assert(got(("b", 0L)) == ("b", 0L, 1L, 7L, 7L, 0L))
    // sorted batching wastes no more than any contiguous batching of
    // the same counts: total waste equals sum of per-batch (max-mean)
    val totalWaste = got.values.map(_._6).sum
    assert(totalWaste == 3L)
  }

  test("datasheet shares sum to 1 and doc counts to the corpus size") {
    val docs = Tables(spark, sf, "documents")
    val rows = Corpus.datasheet(docs, "text", "source")
      .as[(String, Long, Long, Double, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._2).sum == docs.count())
    val shareSum = rows.map(_._7).sum
    assert(math.abs(shareSum - 1.0) < 1e-3, s"shares sum to $shareSum")
    rows.foreach { r =>
      assert(r._5 <= r._6, s"${r._1}: p50 ${r._5} > p90 ${r._6}")
    }
  }

  test("c4Clean line rules: terminal punctuation, min words, javascript") {
    val docs = Seq(
      (1L, Seq(
        "one two three.",          // kept
        "no terminal punct here",  // dropped: no terminal punctuation
        "tiny.",                   // dropped: < 3 words
        "uses JavaScript badly.",  // dropped: javascript word (ci)
        "she said \"go now!\"",    // kept: closing quote terminal
        "a b c! d e f?"            // kept: 2 sentence marks
      ).mkString("\n"))).toDF("doc_id", "text")
    val r = Corpus.c4Clean(docs, "doc_id", "text",
      minLineWords = 3, minSentences = 3)
      .as[(Long, Long, Long, Long, Boolean, Boolean, Boolean, String)]
      .head()
    val (_, nLines, nKept, nSent, lorem, brace, kept, clean) = r
    assert(nLines == 6 && nKept == 3, s"lines=$nLines kept=$nKept")
    // sentences: 1 (three.) + 1 (now!) + 2 (c! f?) = 4; "go now!" has
    // one mark inside the quote
    assert(nSent == 4, s"n_sentences=$nSent")
    assert(!lorem && !brace && kept)
    assert(clean == Seq("one two three.", "she said \"go now!\"",
      "a b c! d e f?").mkString("\n"), clean)
  }

  test("c4Clean page rules: lorem ipsum, curly brace, min sentences") {
    val docs = Seq(
      (1L, "good line number one.\nLorem Ipsum filler text."),
      (2L, "good line number one.\nvar x = function() {"),
      (3L, "only one sentence here."),
      (4L, "first good sentence here.\nsecond good sentence here.")
    ).toDF("doc_id", "text")
    val got = Corpus.c4Clean(docs, "doc_id", "text",
      minLineWords = 3, minSentences = 2)
      .select("id", "has_lorem", "has_brace", "kept_page")
      .as[(Long, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((true, false, false)), "lorem ipsum page dropped (ci)")
    assert(got(2L) == ((false, true, false)), "curly-brace page dropped")
    assert(got(3L) == ((false, false, false)), "under min sentences")
    assert(got(4L) == ((false, false, true)), "clean 2-sentence page kept")
  }

  test("c4Clean rebuilds empty text when every line drops") {
    val docs = Seq((9L, "no punct at all\nstill none")).toDF("doc_id", "text")
    val r = Corpus.c4Clean(docs, "doc_id", "text", 3, 1)
      .select("n_kept", "clean_text").as[(Long, String)].head()
    assert(r == ((0L, "")), r)
  }

  test("c4Clean surfaces null-text documents instead of dropping the row") {
    val docs = Seq((1L, "good first sentence here."), (2L, null))
      .toDF("doc_id", "text")
    val got = Corpus.c4Clean(docs, "doc_id", "text", 3, 1)
      .select("id", "kept_page", "n_kept", "clean_text")
      .as[(Long, Boolean, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet == Set(1L, 2L), "one output row per input document")
    assert(got(2L) == ((false, 0L, "")), got(2L))
    assert(got(1L)._1, "clean page still kept")
  }
}
