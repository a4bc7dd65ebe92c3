package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bloom, Corpus}

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def docsBench = {
    val bench = Seq(
      (100L, "what is the capital of france paris obviously"),
      (101L, "name the largest planet in our solar system")).toDF("id", "text")
    val docs = Seq(
      (1L, "today we ask what is the capital of france paris obviously a classic"),
      (2L, "the largest planet in our solar system is jupiter by a wide margin"),
      (3L, "an entirely unrelated recipe for sourdough bread with rye flour"),
      (4L, "short"),
      (5L, "name the largest planet in our solar system twice for good measure " +
        "name the largest planet in our solar system")).toDF("id", "text")
    (docs, bench)
  }

  test("no false negatives: bloom flags are a per-doc superset of exact contamination") {
    val (docs, bench) = docsBench
    val bloom = Bloom.buildGramBloom(bench, "id", "text", n = 4,
      expectedItems = 64, numBits = 4096)
    val flagged = Bloom.contaminationBloom(docs, "id", "text", bloom, n = 4)
      .as[(Long, Long)].collect().toMap
    val exact = Corpus.contamination(docs, bench, "id", "text", n = 4)
      .as[(Long, Long)].collect().toMap
    for ((id, nShared) <- exact)
      assert(flagged.getOrElse(id, 0L) >= nShared,
        s"doc $id: bloom ${flagged.get(id)} < exact $nShared")
    // and on this tiny vocabulary with generous bits there are no FPs at
    // all, so the sets coincide exactly
    assert(flagged == exact)
  }

  test("filter bytes are partitioning-independent (OR-merge determinism)") {
    val (_, bench) = docsBench
    val b1 = Bloom.buildGramBloom(bench.repartition(7), "id", "text", 4, 64, 4096)
    val b2 = Bloom.buildGramBloom(bench.repartition(1), "id", "text", 4, 64, 4096)
    val b3 = Bloom.buildGramBloom(bench.repartition(3, col("id")), "id", "text", 4, 64, 4096)
    assert(java.util.Arrays.equals(b1, b2) && java.util.Arrays.equals(b2, b3))
  }

  test("false-positive rate is bounded at the designed m/n ratio") {
    // 500 members, m = 14.4n bits => p ~ 0.1%; probe 5000 non-members
    val members = (1L to 500L).map(i => s"member_gram_$i").toDF("g")
    val bloom = Bloom.build(members, col("g"), 500, 7200)
    val probes = (1L to 5000L).map(i => s"absent_gram_$i").toDF("g")
    val fp = probes.filter(Bloom.mightContain(bloom, col("g"))).count()
    assert(fp <= 25, s"fp=$fp of 5000 — far above the designed 0.1%")
    // ...and every member still probes TRUE
    assert(members.filter(Bloom.mightContain(bloom, col("g"))).count() == 500)
  }

  test("a build past Spark's silent clamp ceiling fails loudly, naming the knob") {
    // BloomFilterAggregate clamps numBits/expectedItems to the session
    // ceilings WITHOUT error — a saturated filter would quietly degrade
    // to percent-grade false positives. The build must refuse instead.
    val members = (1L to 10L).map(i => s"g$i").toDF("g")
    val maxBits = spark.sessionState.conf.getConf(
      org.apache.spark.sql.internal.SQLConf.RUNTIME_BLOOM_FILTER_MAX_NUM_BITS)
    val e = intercept[IllegalArgumentException] {
      Bloom.build(members, col("g"), 10, maxBits + 1)
    }
    assert(e.getMessage.contains("maxNumBits"), e.getMessage)
    val maxItems = spark.sessionState.conf.getConf(
      org.apache.spark.sql.internal.SQLConf.RUNTIME_BLOOM_FILTER_MAX_NUM_ITEMS)
    val e2 = intercept[IllegalArgumentException] {
      Bloom.build(members, col("g"), maxItems + 1, 4096)
    }
    assert(e2.getMessage.contains("maxNumItems"), e2.getMessage)
    // and the raised GraftSession ceilings accommodate the sized build
    // to ~10^8 measured grams (48 bits/item)
    assert(100000000L * 48 <= maxBits,
      s"session ceiling $maxBits below the sized build's documented range")
  }

  test("empty benchmark builds an empty filter: nothing is flagged") {
    val (docs, bench) = docsBench
    val bloom = Bloom.buildGramBloom(bench.filter(col("id") < 0L),
      "id", "text", 4, 64, 4096)
    assert(Bloom.contaminationBloom(docs, "id", "text", bloom, 4).count() == 0)
  }

  test("minShared raises the flag threshold like the exact operator") {
    val (docs, bench) = docsBench
    val bloom = Bloom.buildGramBloom(bench, "id", "text", 4, 64, 4096)
    val strict = Bloom.contaminationBloom(docs, "id", "text", bloom, 4,
      minShared = 3).as[(Long, Long)].collect().toMap
    assert(strict.values.forall(_ >= 3))
    val exact = Corpus.contamination(docs, bench, "id", "text", 4, minShared = 3)
      .as[(Long, Long)].collect().toMap
    assert(strict.keySet == exact.keySet)
  }
}
