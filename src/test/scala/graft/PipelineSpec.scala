package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.pipeline.Rag

class PipelineSpec extends SparkSpec {

  test("rag e2e: every row carries k products, prompt json, response json") {
    val out = Rag.e2e(spark, sf).limit(50).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val products = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("products"))
      assert(products.length == Rag.K)
      val prompt = r.getString(r.fieldIndex("prompt"))
      assert(prompt.startsWith("""{"role":"user","content":"""))
      val resp = r.getString(r.fieldIndex("json_response"))
      assert(resp.startsWith("""{"role":"assistant""""))
    }
  }

  test("rag e2e is deterministic across runs") {
    val a = Rag.e2e(spark, sf).limit(20).collect().map(_.toString).toSeq
    val b = Rag.e2e(spark, sf).limit(20).collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("prompt json matches the flink JSON_OBJECT shape (compact, arg order)") {
    import spark.implicits._
    val df = Seq(("u1", "find shoes")).toDF("sessionid", "content")
      .select(to_json(struct(
        lit("user").as("role"), col("content"), col("sessionid"))).as("j"))
    assert(df.head().getString(0) ==
      """{"role":"user","content":"find shoes","sessionid":"u1"}""")
  }

  test("bloom-served decontamination: guaranteed superset of the exact-join flags") {
    // the operator's CONTRACT is one-sided: every exactly-contaminated
    // doc is flagged with at least its exact shared-gram count (no false
    // negatives, ever) — that is what this spec gates on, because
    // equality is probabilistic (a single false-positive gram can flag a
    // clean doc). The oracle's exact equality is carried by the SIZED
    // filter (buildGramBloomSized: 48 bits/measured-gram with a 2²⁴-bit
    // floor), whose expected false-positive count stays ≪ 1 at any sf.
    import graft.operators.{Bloom, Corpus}
    val docs = Tables(spark, sf, "documents")
    val cand = docs.filter(pmod(col("doc_id"), lit(97)) =!= 0)
    val bench = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
    val filt = Bloom.buildGramBloomSized(bench, "doc_id", "text", 4)
    val bloomed = Bloom.contaminationBloom(cand, "doc_id", "text", filt, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val exact = Corpus.contamination(cand, bench, "doc_id", "text", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    exact.foreach { case (id, nShared) =>
      assert(bloomed.getOrElse(id, 0L) >= nShared,
        s"false negative: doc $id bloom ${bloomed.get(id)} < exact $nShared")
    }
    assert(exact.nonEmpty, "vacuous: no contamination in the fixture slice")
    // and at the sized filter's margin, equality in fact holds here
    assert(bloomed == exact,
      s"sized-filter false positives: ${(bloomed.toSet diff exact.toSet).take(5)}")
  }

  test("multimodal: features preserve rows, kinds partition by id, stub is deterministic") {
    val media = Multimodal.withMediaColumn(Tables(spark, sf, "documents"), "doc_id", "text")
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == Tables(spark, sf, "documents").count())
    feats.foreach { f =>
      assert(Set("image", "audio", "video").contains(f.kind))
      assert(f.n_bytes > 0)
      assert(f.decoded_width >= 16)
      if (f.kind == "audio") assert(f.decoded_height == 1)
      assert(f.decoded_mean > 0.0)
    }
    val again = Multimodal.extractFeatures(media).collect()
    assert(feats.map(_.checksum).toSeq == again.map(_.checksum).toSeq)
  }

  test("multimodal resize: exact target grid, first/last bytes preserved") {
    import graft.operators.Multimodal
    val media = Multimodal.withMediaColumn(
      Tables(spark, sf, "documents").limit(20), "doc_id", "text")
    val out = Multimodal.resize(media, 8, 4).collect()
    assert(out.length == 20)
    out.foreach { r =>
      assert(r.width == 8 && r.height == 4 && r.bytes.length == 32)
    }
    // nearest-neighbor anchors: out(0) is the payload's first byte
    val src = media.collect().map(r =>
      r.getAs[Long]("media_id") -> r.getAs[Array[Byte]]("bytes")).toMap
    out.filter(r => src(r.media_id).nonEmpty).foreach { r =>
      assert(r.bytes(0) == src(r.media_id)(0))
    }
  }

  test("multimodal frame sampling: geometry matches arithmetic, stride respected") {
    import graft.operators.Multimodal
    val media = Multimodal.withMediaColumn(
      Tables(spark, sf, "documents").limit(20), "doc_id", "text")
    val frames = Multimodal.sampleFrames(media, frameSize = 100, stride = 3).collect()
    val lens = media.collect().map(r =>
      r.getAs[Long]("media_id") -> r.getAs[Array[Byte]]("bytes").length).toMap
    val byId = frames.groupBy(_.media_id)
    lens.foreach { case (id, n) =>
      val expectedIdx = Range(0, (n + 99) / 100, 3)
      val got = byId.getOrElse(id, Array.empty).sortBy(_.frame_idx)
      assert(got.map(_.frame_idx).toSeq == expectedIdx.toSeq, s"media $id")
      got.foreach(f => assert(f.frame_len == math.min(100, n - f.frame_idx * 100)))
    }
  }

  test("multimodal ops tolerate null payloads (normalized to empty)") {
    import graft.operators.Multimodal
    import spark.implicits._
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "real")).toDF("doc_id", "text")
    val media = Multimodal.withMediaColumn(df, "doc_id", "text")
    assert(Multimodal.extractFeatures(media).collect().length == 2)
    assert(Multimodal.resize(media, 4, 4).collect().forall(_.bytes.length == 16))
    // null payload -> zero frames; real payload -> one
    assert(Multimodal.sampleFrames(media, 100, 1).collect().map(_.media_id).toSeq == Seq(2L))
  }

  test("entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("hybrid rag: vector side pins self at rank 1; fused products from corpus") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val registry = graft.model.Models.default()
    val corpus = Tables(spark, sf, "documents")
      .select(col("doc_id").as("cid"), col("text").as("ctext"))
      .withColumn("cvec", registry.mlPredict(
        graft.model.Models.VectorEncoding, col("ctext")))
    val questions = Tables(spark, sf, "documents")
      .filter(col("doc_id") % 20 === 0)
      .select(col("doc_id"), col("text").as("content"))
    val withVec = graft.pipeline.Rag.embedQuestions(questions, "content")
    // the unit-norm embedder makes self-dot the strict maximum: the
    // self-retrieval law lives on the VECTOR side (the fused ranking
    // may legitimately drop a long diffuse self — BM25 length norm)
    val v1 = graft.operators.VectorSearch.topKAgg(withVec, "doc_id",
        "vector", corpus, "cid", "cvec", 1, "dot")
      .select(col("doc_id"), col("matches")(0)("id").as("top"))
      .as[(Long, Long)].collect()
    assert(v1.nonEmpty)
    v1.foreach { case (q, top) => assert(q == top, s"query $q vector-rank1 $top") }
    // fused slice: every product text is a corpus text
    val out = graft.pipeline.Rag.hybridE2e(spark, sf)
    val texts = Tables(spark, sf, "documents")
      .select("text").as[String].collect().toSet
    out.select(explode(col("products")).as("p"))
      .select(col("p.content").as("c")).as[String]
      .collect().foreach(c => assert(texts.contains(c), s"alien product: $c"))
  }

  test("every oracleSql key has a matching queries key") {
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(qs)
    assert(missing.isEmpty, s"oracleSql keys without queries: $missing")
  }
}
