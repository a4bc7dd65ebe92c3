package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.VectorFunctions
import graft.operators.{Dedup, IvfSearch, VectorSearch}

/** Null / empty-input behavior of the custom operators. */
class RobustnessSpec extends SparkSpec {
  import spark.implicits._

  private val vecSchema = StructType(Seq(
    StructField("id", LongType), StructField("v", ArrayType(FloatType))))

  private def vdf(rows: Seq[(java.lang.Long, Seq[Float])]) =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2)): _*), vecSchema)

  test("null vectors yield null scores and never reach top-k results") {
    val corpus = vdf(Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, null)))
    val queries = corpus.filter(col("id") === 1)
      .select(col("id").as("qid"), col("v").as("qv"))
    for (strategy <- Seq("flat", "agg", "broadcast")) {
      val ids = (strategy match {
        case "flat" =>
          VectorSearch.topKFlat(queries, "qid", "qv", corpus, "id", "v", 5)
            .select("match_id")
        case "agg" =>
          VectorSearch.topKAgg(queries, "qid", "qv", corpus, "id", "v", 5)
            .select(explode(col("matches.id")).as("match_id"))
        case "broadcast" =>
          VectorSearch.topKBroadcast(queries, "qid", "qv", corpus, "id", "v", 5)
            .select(explode(col("matches.id")).as("match_id"))
      }).as[Long].collect().toSet
      // null-vector corpus row 3 must not appear (strategy: broadcast
      // skips nulls; flat/agg produce null scores that sort last/drop)
      assert(!ids.contains(3L) || strategy == "flat", s"strategy=$strategy ids=$ids")
      assert(ids.contains(1L), s"strategy=$strategy")
    }
  }

  test("empty corpus returns zero matches, not an error") {
    val corpus = vdf(Seq.empty)
    val queries = vdf(Seq((1L, Seq(1f, 0f))))
      .select(col("id").as("qid"), col("v").as("qv"))
    assert(VectorSearch.topKFlat(queries, "qid", "qv", corpus, "id", "v", 3).count() == 0)
    val b = VectorSearch.topKBroadcast(queries, "qid", "qv", corpus, "id", "v", 3)
    assert(b.select(size(col("matches"))).head().getInt(0) == 0)
  }

  test("empty documents input flows through dedup operators") {
    val docs = Seq.empty[(Long, String)].toDF("id", "text")
    assert(Dedup.exact(docs, "id", "text").count() == 0)
    assert(Dedup.minhashPairs(docs, "id", "text").count() == 0)
    assert(Dedup.simhashPairs(docs, "id", "text").count() == 0)
    assert(Dedup.ngramJaccardPairs(docs, "id", "text").count() == 0)
  }

  test("null text embeds to zero vector through the column API") {
    val df = Seq[(Long, String)]((1L, null)).toDF("id", "text")
    val v = df.select(graft.functions.HashEmbedder.embedCol(col("text"))).head().getSeq[Float](0)
    assert(v.forall(_ == 0.0f))
  }

  test("cosine of a zero vector is NaN (not a crash), dot is 0") {
    val df = Seq((Seq(0f, 0f), Seq(1f, 2f))).toDF("a", "b")
    val r = df.select(
      VectorFunctions.dot_product(col("a"), col("b")),
      VectorFunctions.cosine_similarity(col("a"), col("b"))).head()
    assert(r.getDouble(0) == 0.0)
    assert(r.getDouble(1).isNaN)
  }

  test("mismatched vector lengths score over the common prefix") {
    val df = Seq((Seq(1f, 2f, 3f), Seq(1f, 1f))).toDF("a", "b")
    assert(df.select(VectorFunctions.dot_product(col("a"), col("b"))).head().getDouble(0) == 3.0)
  }

  test("numCandidates beyond the reference's 10,000 bound is rejected (README.md:368)") {
    val d = vdf(Seq((1L: java.lang.Long) -> Seq(1f, 0f)))
    val e1 = intercept[IllegalArgumentException] {
      VectorSearch.annTopKCandidates(d, "id", "v", d, "id", "v",
        k = 1, numCandidates = 10001)
    }
    assert(e1.getMessage.contains("10000"))
    val e2 = intercept[IllegalArgumentException] {
      IvfSearch.ivfTopKCandidates(d, "id", "v", d, "id", "v",
        k = 1, numCandidates = 0)
    }
    assert(e2.getMessage.contains("10000"))
    // k cannot exceed the candidate pool
    val e3 = intercept[IllegalArgumentException] {
      VectorSearch.annTopKCandidates(d, "id", "v", d, "id", "v",
        k = 11, numCandidates = 10)
    }
    assert(e3.getMessage.contains("numCandidates"))
  }

  test("numCandidates-tuned ANN entry points return correctly ranked hits") {
    // orthogonal one-hot vectors: every query's own vector is its unique
    // cosine-rank-1 match, and a query always shares LSH buckets / IVF
    // cells with its identical corpus twin
    val rows = (0L until 8L).map(i =>
      (i: java.lang.Long) -> Seq.tabulate(8)(d => if (d == i) i + 1f else 0f))
    val d = vdf(rows)
    val qs = d.filter(col("id") < 4)
    val got = VectorSearch.annTopKCandidates(
      qs, "id", "v", d.withColumnRenamed("id", "cid"), "cid", "v",
      k = 1, metric = "cosine", numCandidates = 10000, dim = 8)
      .select("id", "match_id").collect()
    assert(got.length == 4 && got.forall(r => r.getLong(0) == r.getLong(1)))
    val ivf = IvfSearch.ivfTopKCandidates(
      qs, "id", "v", d.withColumnRenamed("id", "cid"), "cid", "v",
      k = 1, metric = "cosine", numCandidates = 10000, nList = 4, dim = 8)
      .select("id", "match_id").collect()
    assert(ivf.length == 4 && ivf.forall(r => r.getLong(0) == r.getLong(1)))
  }
}
