package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

class SkewAndBucketSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals plain aggregation") {
    val li = Tables(spark, sf, "lineitem")
    val plain = li.groupBy(col("l_returnflag").as("k"))
      .agg(sum(col("l_quantity")).as("q"), sum(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = SkewJoin.saltedSumAgg(
      li.withColumnRenamed("l_returnflag", "k"), "k", buckets = 8,
      aggs = Seq("q" -> col("l_quantity"), "n" -> lit(1)))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("partitioned-by-column write prunes partitions at the scan") {
    // the 100 TB layout: fact tables partitioned by a coarse key (date,
    // IVF cell, source) so a keyed query touches only its partitions
    val dir = java.nio.file.Files.createTempDirectory("graft_partprune").toString
    Tables(spark, sf, "events")
      .withColumn("etype", col("event_type"))
      .write.partitionBy("etype").parquet(s"$dir/events_p")
    val scan = spark.read.parquet(s"$dir/events_p").filter(col("etype") === "purchase")
    // the filter lands in PartitionFilters (file-listing pruning), and the
    // scan node touches only the one matching partition directory
    val fileScan = scan.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    assert(fileScan.partitionFilters.exists(_.toString.contains("etype")),
      s"etype filter not in PartitionFilters: ${fileScan.partitionFilters}")
    assert(fileScan.selectedPartitions.partitionCount == 1,
      s"expected 1 pruned partition, got ${fileScan.selectedPartitions.partitionCount}")
    val expected = Tables(spark, sf, "events")
      .filter(col("event_type") === "purchase").count()
    assert(scan.count() == expected)
  }

  test("salted join equals plain join on skewed data") {
    // heavily skewed: 90% of rows share one key
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 0L, i)).toDF("k", "v")
    val small = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "tag")
    val plain = big.join(small, "k").select("k", "v", "tag")
      .collect().map(_.toString).sorted.toSeq
    val salted = SkewJoin.saltedJoin(big, small, "k", buckets = 8)
      .select("k", "v", "tag").collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("hot content key: line/span dedup stay correct under extreme key skew") {
    import graft.operators.Dedup
    // 3000 docs all carrying the SAME boilerplate line (the Zipf head
    // the r8 groupBy+join rewrite exists for), each with a unique line
    val docs = (1L to 3000L)
      .map(i => (i, s"all rights reserved\nunique line $i"))
      .toDF("id", "text")
    val ld = Dedup.lineDedup(docs, "id", "text", minDocs = 2)
    // every doc survives (unique line), only doc 1 keeps the hot line
    assert(ld.count() == 3000)
    val withHot = ld.filter(col("clean_text").contains("all rights reserved"))
      .select("id").as[Long].collect().toSeq
    assert(withHot == Seq(1L), s"keeper set: $withHot")
    // the same hot-key stress through the span path: 8-token prefix
    // shared by all docs — n_docs must be exact at full skew
    val spanDocs = (1L to 3000L)
      .map(i => (i, s"t1 t2 t3 t4 t5 t6 t7 t8 unique$i"))
      .toDF("id", "text")
    val spans = Dedup.duplicateSpansHashed(spanDocs, "id", "text",
      n = 8, minDocs = 2)
    assert(spans.filter(col("pos") === 1).count() == 3000)
    assert(spans.filter(col("pos") === 1).select("n_docs")
      .distinct().as[Long].collect().toSeq == Seq(3000L))
  }

  test("mega duplicate group: exact dedup has no single-task content-key sort") {
    import graft.operators.Dedup
    // the Zipf-head case: 5000 copies of ONE document (the empty page /
    // boilerplate 404 body of web-scale dedup) plus distinct tails. A
    // window over the content key would serialize the 5000-row group
    // onto one unsplittable sort task; the groupBy + join-back shape
    // partial-aggregates it map-side.
    val docs = ((1L to 5000L).map(i => (i, "error 404 page not found")) ++
      (5001L to 5200L).map(i => (i, s"unique document $i"))).toDF("id", "text")
    for (dedup <- Seq(
        Dedup.exact(docs, "id", "text"),
        Dedup.exactScalable(docs, "id", "text"))) {
      val plan = dedup.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"content-key window in plan:\n$plan")
      val ids = dedup.select("id").as[Long].collect().toSet
      assert(ids == (Set(1L) ++ (5001L to 5200L)), s"survivors: ${ids.size}")
    }
    // keepBest under the same skew: quality desc, id asc tie-break
    val scored = docs.withColumn("q",
      when(col("id") === 4999L, 9.0).otherwise(lit(1.0) / col("id")))
    val kb = Dedup.exactKeepBest(scored, "id", "text", "q")
    assert(!kb.queryExecution.executedPlan.toString.contains("Window"))
    val kbIds = kb.select("id").as[Long].collect().toSet
    // the hot group keeps its quality-9 member; singletons keep themselves
    assert(kbIds == (Set(4999L) ++ (5001L to 5200L)), s"keepBest: ${kbIds.size}")
    // tie-break: equal quality -> lowest id survives
    val tied = Seq((7L, "same text", 1.0), (3L, "same text", 1.0),
      (5L, "same  TEXT", 1.0)).toDF("id", "text", "q")
    assert(Dedup.exactKeepBest(tied, "id", "text", "q")
      .select("id").as[Long].collect().toSeq == Seq(3L))
  }

  test("hot stratum: takePerStratum has no single-task stratum sort") {
    import graft.operators.Corpus
    // one source owning 96% of the corpus — a row_number window over the
    // stratum would sort the whole hot stratum in one task; the
    // bounded-heap shape partial-aggregates ≤ n ids per partition
    val docs = ((1L to 5000L).map(i => (i, "crawl")) ++
      (5001L to 5200L).map(i => (i, s"src${i % 7}"))).toDF("id", "src")
    val taken = Corpus.takePerStratum(docs, "id", "src", n = 3)
    val plan = taken.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"stratum window in plan:\n$plan")
    // selection must equal the window-ordered reference exactly
    // (sampleHash asc, id asc within each stratum)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src"))
      .orderBy(Corpus.sampleHash(col("id")), col("id"))
    val ref = docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("id").as[Long].collect().toSet
    assert(taken.select("id").as[Long].collect().toSet == ref)
    // null stratum is its own group, same as the window semantics
    val withNull = docs.withColumn("src",
      when(col("id") <= 10L, lit(null: String)).otherwise(col("src")))
    val refN = withNull.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("id").as[Long].collect().toSet
    assert(Corpus.takePerStratum(withNull, "id", "src", 3)
      .select("id").as[Long].collect().toSet == refN)
    assert(Corpus.takePerStratum(docs, "id", "src", 0).count() == 0)
  }

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    val suffix = System.nanoTime() // fresh names: stale warehouse dirs survive DROP TABLE
    val liT = s"li_bucketed_$suffix"; val ordT = s"ord_bucketed_$suffix"
    Tables(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable(liT)
    Tables(spark, sf, "orders").select("o_orderkey", "o_orderstatus")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable(ordT)
    val joined = spark.table(liT)
      .join(spark.table(ordT),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    // both sides read pre-bucketed: the sort-merge join needs no shuffle
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    // and it still returns the right row count
    val expected = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(joined.count() == expected)
  }
}
