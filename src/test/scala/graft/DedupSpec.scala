package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("id", "text")

  test("exact dedup keeps lowest id per normalized text") {
    val df = docs(
      1L -> "Hello  World", 2L -> "hello world", 3L -> "other doc",
      4L -> "  HELLO   WORLD  ")
    val kept = Dedup.exact(df, "id", "text").select("id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L))
  }

  test("exactScalable (hash-keyed) agrees with exact (text-keyed)") {
    val docs = Tables(spark, sf, "documents")
    val a = Dedup.exact(docs, "doc_id", "text").select("doc_id").as[Long].collect().sorted.toSeq
    val b = Dedup.exactScalable(docs, "doc_id", "text").select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("hll approx distinct within its declared error of exact") {
    val li = Tables(spark, sf, "lineitem")
    val exact = li.select(countDistinct(col("l_partkey"))).head().getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"), 0.02)).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("minhash finds planted near-duplicate, skips unrelated") {
    val base = (1 to 60).map(i => s"token$i").mkString(" ")
    val nearDup = (1 to 58).map(i => s"token$i").mkString(" ") + " tokenX tokenY"
    val other = (100 to 160).map(i => s"w$i").mkString(" ")
    val pairs = Dedup.minhashPairs(
      docs(1L -> base, 2L -> nearDup, 3L -> other), "id", "text",
      numHashes = 64, bands = 16, shingleLen = 5, threshold = 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("simhash finds planted near-duplicate within maxDist") {
    val base = (1 to 60).map(i => s"token$i").mkString(" ")
    val nearDup = base + " extra"
    val other = (100 to 160).map(i => s"w$i").mkString(" ")
    val pairs = Dedup.simhashPairs(
      docs(1L -> base, 2L -> nearDup, 3L -> other), "id", "text", maxDist = 8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("ngram jaccard matches brute force on a small corpus") {
    val corpus = Seq(
      1L -> "a b c d e f g",
      2L -> "a b c d e f x",
      3L -> "z y x w v u t",
      4L -> "a b c q r s t")
    def grams(s: String) = s.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val expected = (for {
      (i, ti) <- corpus; (j, tj) <- corpus if i < j
      gi = grams(ti); gj = grams(tj)
      jac = gi.intersect(gj).size.toDouble / gi.union(gj).size.toDouble
      if jac >= 0.2
    } yield (i, j)).toSet
    val got = Dedup.ngramJaccardPairs(docs(corpus: _*), "id", "text", n = 3, threshold = 0.2)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("dedup pipeline removes exact and minhash near-dups, keeps low ids") {
    val base = (1 to 60).map(i => s"token$i").mkString(" ")
    val df = docs(
      1L -> base,
      2L -> base.toUpperCase,                                     // exact dup of 1
      3L -> ((1 to 58).map(i => s"token$i").mkString(" ") + " x y"), // near-dup of 1
      4L -> (100 to 160).map(i => s"w$i").mkString(" "))          // unrelated
    val kept = Dedup.dedupPipeline(df, "id", "text", minhashThreshold = 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 4L))
  }

  test("streaming dedup drops re-delivered events (equals batch distinct)") {
    import org.apache.spark.sql.streaming.Trigger
    val events = Tables(spark, sf, "events").limit(200)
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_stream").toString
    // the same file twice = an exactly-once failure/retry re-delivery
    events.coalesce(1).write.parquet(s"$dir/a")
    events.coalesce(1).write.parquet(s"$dir/b")
    val stream = graft.streaming.Streams.dedupStream(
      spark.readStream.schema(events.schema).parquet(s"$dir/*"), "event_id")
    val q = stream.writeStream
      .format("memory").queryName("dedup_stream_test").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.table("dedup_stream_test").select("event_id").distinct().count() ==
      events.count())
    assert(spark.table("dedup_stream_test").count() == events.count())
  }

  test("embedding near-dup pairs symmetric corpus sanity") {
    val emb = Tables(spark, sf, "embeddings")
    val pairs = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", threshold = 0.99)
      .collect()
    // id1 < id2 always; cosine within [-1, 1]
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(math.abs(r.getDouble(2)) <= 1.0)
    }
  }
}
