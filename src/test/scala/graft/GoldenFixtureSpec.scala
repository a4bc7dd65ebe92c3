package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.HashEmbedder
import graft.model.Models
import graft.operators.VectorSearch

/** FIXTURES.md §A golden tests: the reference's own canonical messages
  * driven through the engine, with byte-exact expectations where the
  * reference pins a shape.
  */
class GoldenFixtureSpec extends SparkSpec {
  import spark.implicits._

  // A1: the reference's sample user_questions record (README.md:190) and
  // canonical question (README.md:111-113)
  private val canonical = "Find me a pair of mens formal shoes in medium size."

  test("A1->A2: canonical question embeds to a deterministic unit vector") {
    val v1 = HashEmbedder.embed(canonical, 64)
    val v2 = HashEmbedder.embed(canonical, 64)
    assert(v1.sameElements(v2))
    assert(math.abs(math.sqrt(v1.map(x => x.toDouble * x).sum) - 1.0) < 1e-5)
  }

  test("A5: prompt-assembly JSON is compact with keys in argument order") {
    // json_object('role' VALUE role, 'content' VALUE content,
    //             'products' VALUE cast(products AS STRING))  (README.md:504-508)
    val products = Seq(
      Row("Blue Medium Adult Male Shoes, product_id: 101"),
      Row("Blue Medium Adult Female Shoes, product_id: 102"))
    val schema = StructType(Seq(
      StructField("role", StringType), StructField("content", StringType),
      StructField("sessionid", StringType),
      StructField("products", ArrayType(StructType(Seq(StructField("content", StringType)))))))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row("user", canonical, "abc256", products)), schema)
    val got = df.select(to_json(struct(
      col("role"), col("content"), to_json(col("products")).as("products"))).as("j"))
      .head().getString(0)
    val expected =
      """{"role":"user","content":"Find me a pair of mens formal shoes in medium size.",""" +
        """"products":"[{\"content\":\"Blue Medium Adult Male Shoes, product_id: 101\"},""" +
        """{\"content\":\"Blue Medium Adult Female Shoes, product_id: 102\"}]"}"""
    assert(got == expected)
  }

  test("A6: embedding-response envelope shape (64-dim deterministic)") {
    // the golden files' envelope: {object, data:[{object,index,embedding}], model, usage}
    val env = df_envelope(canonical)
    val row = env.head()
    assert(row.getString(row.fieldIndex("object")) == "list")
    val data = row.getSeq[Row](row.fieldIndex("data"))
    assert(data.length == 1)
    assert(data.head.getSeq[Float](data.head.fieldIndex("embedding")).length == 64)
    assert(row.getString(row.fieldIndex("model")) == "hash-embedder-64")
  }

  private def df_envelope(text: String) =
    Seq(text).toDF("input").select(
      lit("list").as("object"),
      array(struct(
        lit("embedding").as("object"), lit(0).as("index"),
        HashEmbedder.embedCol(col("input")).as("embedding"))).as("data"),
      lit("hash-embedder-64").as("model"),
      struct(graft.functions.TextOps.tokenCountWs(col("input")).as("prompt_tokens"))
        .as("usage"))

  test("A3/A4: full reference flow — question to llm_answers row") {
    val questions = Seq(("user", canonical, "abc123")).toDF("role", "content", "sessionid")
    val corpus = Tables(spark, sf, "embeddings")
      .withColumn("content", concat(lit("product_"), col("vec_id")))
    val registry = Models.default()
    val withVec = questions.withColumn("vector",
      registry.mlPredict(Models.VectorEncoding, col("content")))
    val retrieved = VectorSearch.searchResults(
      withVec, "sessionid", "vector", corpus, "vec_id", "embedding",
      payload = Seq("content"), k = 3)
      .withColumnRenamed("search_results", "products")
    val answers = retrieved
      .withColumn("prompt", to_json(struct(col("role"), col("content"),
        to_json(col("products")).as("products"))))
      .withColumn("json_response",
        registry.mlPredict(Models.RetailAssistant, col("prompt")))
      .select("role", "content", "sessionid", "json_response")
    val row = answers.head()
    assert(row.getString(0) == "user")
    assert(row.getString(2) == "abc123")
    assert(row.getString(3).startsWith("""{"role":"assistant""""))
    // deterministic across runs
    assert(answers.head().getString(3) == row.getString(3))
  }
}
