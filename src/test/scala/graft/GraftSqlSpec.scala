package graft

import org.apache.spark.sql.functions._
import graft.sql.GraftSql
import graft.sources.TopicCatalog

/** The reference user's worksheets run VERBATIM: these statements are
  * copied character-for-character from the reference README (cited per
  * test) and executed through the [[GraftSql]] facade.
  */
class GraftSqlSpec extends SparkSpec {

  private def facade() = new GraftSql(spark,
    new TopicCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft_sql_topics").toString))

  test("reference CREATE MODEL vector_encoding runs verbatim (README.md:205-212)") {
    val g = facade()
    g.execute("""CREATE MODEL `vector_encoding`
INPUT (input STRING)
OUTPUT (vector ARRAY<FLOAT>)
WITH(
  'TASK' = 'embedding',
  'PROVIDER' = 'openai',
  'OPENAI.CONNECTION' = 'openai-vector-connection'
);""")
    val d = g.execute("DESCRIBE MODEL vector_encoding").collect().head
    assert(d.getAs[String]("name") == "vector_encoding")
    assert(d.getAs[String]("task") == "embedding")
    assert(d.getAs[String]("output") == "ARRAY<FLOAT>")
    // the model actually embeds
    import spark.implicits._
    val v = Seq("hello world").toDF("t")
      .select(g.registry.mlPredict("vector_encoding", col("t"))).head.getSeq[Float](0)
    assert(v.length == 64)
  }

  test("reference CREATE MODEL retail_assistant + ALTER default (README.md:469-479,714)") {
    val g = facade()
    val create = """CREATE MODEL retail_assistant
INPUT(prompts STRING)
OUTPUT(json_response STRING)
COMMENT 'retail assistant model'
WITH (
  'provider' = 'openai',
  'task' = 'classification',
  'openai.connection' = 'openai-llm-connection',
  'openai.model_version' = 'gpt-4',
  'openai.system_prompt' = 'You are a retail assistant helping the user select clothing items.'
);"""
    g.execute(create)
    g.execute(create) // re-create = new version, like the reference
    g.execute(create)
    g.execute(create)
    g.execute("ALTER MODEL `retail_assistant` SET ('default_version'='4');")
    val all = g.execute("DESCRIBE MODEL retail_assistant$all").collect()
    assert(all.length == 4)
    assert(all.filter(_.getAs[Boolean]("is_default")).map(_.getAs[Int]("version")).toSeq == Seq(4))
    // version pin syntax still resolves
    import spark.implicits._
    val out = Seq("shirts?").toDF("p")
      .select(g.registry.mlPredict("retail_assistant$2", col("p"))).head.getString(0)
    assert(out.contains("\"role\":\"assistant\""))
    assert(out.contains("clothing items"), "system prompt from the DDL is wired in")
  }

  test("reference CREATE TABLE user_questions_vector runs verbatim (README.md:266-273)") {
    val g = facade()
    g.execute("""CREATE TABLE `user_questions_vector` (
    `role`         STRING,
    `content`      STRING,
    `sessionid`    STRING,
    `vector`      ARRAY<FLOAT>
) WITH (
  'value.format' = 'json-registry'
);""")
    val schema = g.topics.schemaOf("user_questions_vector")
    assert(schema.fieldNames.toSeq == Seq("key", "role", "content", "sessionid", "vector"))
    // produce + query through plain SQL against the registered view
    g.topics.produceJson("user_questions_vector", Seq(
      """{"role":"user","content":"find shoes","sessionid":"s1","vector":[1.0,2.0]}"""))
    val rows = g.execute(
      "SELECT content, sessionid FROM user_questions_vector ORDER BY sessionid").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("find shoes"))
  }

  test("non-DDL statements delegate to spark.sql") {
    val g = facade()
    assert(g.execute("SELECT 1 + 1 AS two").head.getInt(0) == 2)
  }
}
