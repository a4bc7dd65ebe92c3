package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityClassifier
import graft.functions.TextOps

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables(spark, sf, "documents")

  test("training is deterministic across partitionings") {
    val a = QualityClassifier.train(docs, "doc_id", "text",
      TextOps.gopherPass(col("text")), dimBits = 8, iters = 3)
    val b = QualityClassifier.train(docs.repartition(13), "doc_id", "text",
      TextOps.gopherPass(col("text")), dimBits = 8, iters = 3)
    assert(a.weights.sameElements(b.weights),
      "integer-scaled sums must make training partition-order independent")
  }

  test("scores are probabilities and separate the weak labels (AUC)") {
    val model = QualityClassifier.train(docs, "doc_id", "text",
      TextOps.gopherPass(col("text")))
    val scored = QualityClassifier.score(docs, "doc_id", "text", model)
      .join(docs.select(col("doc_id").as("id"),
        TextOps.gopherPass(col("text")).as("y")), "id")
    val bounds = scored.agg(min("score"), max("score")).head()
    assert(bounds.getDouble(0) >= 0.0 && bounds.getDouble(1) <= 1.0)
    val a = QualityClassifier.auc(scored, "score", "y").head()
    assert(a.getLong(0) > 0 && a.getLong(1) > 0,
      s"degenerate label split: $a — the weak labels must have both classes")
    assert(a.getDouble(2) >= 0.75,
      s"AUC ${a.getDouble(2)} too low — the classifier failed to learn the gate")
  }

  test("auc matches hand-computed values including tie half-credit") {
    // perfect separation
    val perfect = Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false))
      .toDF("score", "y")
    assert(QualityClassifier.auc(perfect, "score", "y").head().getDouble(2) == 1.0)
    // total inversion
    val inverted = Seq((0.1, true), (0.9, false)).toDF("score", "y")
    assert(QualityClassifier.auc(inverted, "score", "y").head().getDouble(2) == 0.0)
    // one tied score carrying one of each class -> half credit:
    // U = 1·(0 + 1/2) ... auc = 0.5 for the all-tied pair
    val tied = Seq((0.5, true), (0.5, false)).toDF("score", "y")
    assert(QualityClassifier.auc(tied, "score", "y").head().getDouble(2) == 0.5)
    // mixed: pos at 0.9 above neg 0.3 (credit 1), pos at 0.3 tied with
    // neg 0.3 (credit 1/2), so U = 1 + 1/2 over n_pos·n_neg = 2 → 0.75
    val mixed = Seq((0.9, true), (0.3, true), (0.3, false)).toDF("score", "y")
    assert(QualityClassifier.auc(mixed, "score", "y").head().getDouble(2) == 0.75)
  }

  test("cachedModel trains once per tag and round-trips through parquet") {
    val before = QualityClassifier.trainInvocations.get()
    val tag = s"qcspec_${System.nanoTime()}"
    val lbl = TextOps.gopherPass(col("text"))
    val a = QualityClassifier.cachedModel(docs, "doc_id", "text", lbl, tag,
      dimBits = 8, iters = 2, persist = false)
    assert(QualityClassifier.trainInvocations.get() == before + 1)
    val b = QualityClassifier.cachedModel(docs, "doc_id", "text", lbl, tag,
      dimBits = 8, iters = 2, persist = false)
    assert(QualityClassifier.trainInvocations.get() == before + 1,
      "second lookup must not retrain")
    assert(a.weights.sameElements(b.weights))
    // persisted round-trip preserves shape and weights exactly
    val dir = java.nio.file.Files.createTempDirectory("qc_model").toString
    QualityClassifier.saveModel(spark, s"$dir/m", a)
    val r = QualityClassifier.loadModel(spark, s"$dir/m")
    assert(r.dimBits == 8 && r.weights.sameElements(a.weights))
  }

  test("structural features ride at the reserved ids above the hashed vocab") {
    val f = QualityClassifier.features(docs.limit(5), "doc_id", "text",
      dimBits = 6)
    val ids = f.select("f").distinct().as[Long].collect()
    val nStruct = QualityClassifier.structuralNames.length
    assert(ids.forall(i => i >= 0 && i < 64 + nStruct))
    // every doc carries every dense feature exactly once
    val dense = f.filter(col("f") >= 64)
      .groupBy("id").count().as[(Long, Long)].collect()
    assert(dense.length == 5 && dense.forall(_._2 == nStruct))
  }
}
