package graft

import org.apache.spark.sql.functions._
import graft.model.{ModelNotFoundException, ModelRegistry, Models, StubLlm}

class RegistrySpec extends SparkSpec {
  import spark.implicits._

  private def reg(): ModelRegistry = {
    val r = new ModelRegistry
    r.create("m", "test", "STRING", "STRING", Map.empty, c => upper(c))
    r.create("m", "test", "STRING", "STRING", Map.empty, c => lower(c))
    r
  }

  test("default version is the first created") {
    val r = reg()
    val out = Seq("MiXeD").toDF("t").select(r.mlPredict("m", col("t"))).head().getString(0)
    assert(out == "MIXED")
  }

  test("version pin via name$version") {
    val r = reg()
    val out = Seq("MiXeD").toDF("t").select(r.mlPredict("m$2", col("t"))).head().getString(0)
    assert(out == "mixed")
  }

  test("alter default version") {
    val r = reg()
    r.setDefault("m", 2)
    val out = Seq("MiXeD").toDF("t").select(r.mlPredict("m", col("t"))).head().getString(0)
    assert(out == "mixed")
  }

  test("describe lists versions and default flag") {
    val r = reg()
    val all = r.describe(spark, "m", all = true).collect()
    assert(all.length == 2)
    val d = r.describe(spark, "m").collect()
    assert(d.length == 1 && d(0).getInt(1) == 1 && d(0).getBoolean(2))
  }

  test("missing model / version raise ModelNotFoundException") {
    val r = reg()
    intercept[ModelNotFoundException](r.resolve("nope"))
    intercept[ModelNotFoundException](r.resolve("m$7"))
  }

  test("stub llm is deterministic valid JSON with the system prompt") {
    val a = StubLlm.respond("sys", "what shoes do you have?")
    val b = StubLlm.respond("sys", "what shoes do you have?")
    assert(a == b)
    assert(a.startsWith("""{"role":"assistant","content":""""))
    assert(a.contains("[sys]"))
  }

  test("prewired models embed and respond") {
    val r = Models.default()
    val vec = Seq("hello world").toDF("t")
      .select(r.mlPredict(Models.VectorEncoding, col("t"))).head().getSeq[Float](0)
    assert(vec.length == 64)
    val ans = Seq("hi").toDF("t")
      .select(r.mlPredict(Models.RetailAssistant, col("t"))).head().getString(0)
    assert(ans.nonEmpty)
  }
}
