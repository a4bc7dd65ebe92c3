package graft

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("extension-registered scalar functions work from SQL") {
    Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b").createOrReplaceTempView("vecs")
    val r = spark.sql(
      "SELECT dot_product(a, b), cosine_similarity(a, a), l2_distance(a, b) FROM vecs").head()
    assert(r.getDouble(0) == 32.0)
    // float32 self-cosine may round just under 1 (14/(sqrt(14f)*sqrt(14f)))
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-6)
    assert(math.abs(r.getDouble(2) - math.sqrt(27)) < 1e-6)
  }

  test("sample_hash from SQL equals Corpus.sampleHash column form") {
    import org.apache.spark.sql.functions.col
    spark.range(0, 1000).toDF("id").createOrReplaceTempView("ids")
    val sql = spark.sql("SELECT sample_hash(id) FROM ids ORDER BY id")
      .as[Long].collect().toSeq
    val col_ = spark.range(0, 1000).toDF("id").orderBy("id")
      .select(graft.operators.Corpus.sampleHash(col("id")))
      .as[Long].collect().toSeq
    assert(sql == col_)
    assert(sql.forall(h => h >= 0 && h < 4294967296L))
  }

  test("top_k_by_score aggregate works from SQL with tie-break") {
    Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (4L, 0.1))
      .toDF("id", "s").createOrReplaceTempView("scored")
    val rows = spark.sql(
      "SELECT inline(top_k_by_score(id, s, 2)) FROM scored").collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((2L, 0.9), (3L, 0.9)))
  }

  test("top_k_by_score ascending variant (distances)") {
    Seq((1L, 5.0), (2L, 1.0), (3L, 3.0))
      .toDF("id", "s").createOrReplaceTempView("dists")
    val rows = spark.sql(
      "SELECT inline(top_k_by_score(id, s, 2, true)) FROM dists").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 3L))
  }

  test("describe function shows registered usage") {
    val desc = spark.sql("DESCRIBE FUNCTION dot_product").collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("dot_product"))
  }
}
