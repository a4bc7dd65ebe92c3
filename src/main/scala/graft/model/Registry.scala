package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import graft.functions.HashEmbedder

/** In-engine replacement for the reference's Flink model registry
  * (`CREATE MODEL` / `DESCRIBE MODEL` / `ALTER MODEL` / `ML_PREDICT`,
  * reference README.md:205-213, 469-480, 660-699, 712-714).
  *
  * A model is a named, versioned Column->Column function plus metadata.
  * Versions are 1-based; the default version is the first created
  * (README.md:718) unless altered (M5). `ML_PREDICT('name$4', ...)` pins a
  * version (README.md:704-708) — the `name$version` syntax is preserved.
  *
  * Registry state is driver-side metadata only (the functions themselves
  * are serialized into tasks like any Spark closure/expression), so this
  * imposes no scale constraint.
  */
final case class ModelVersion(
    version: Int,
    task: String,
    inputType: String,
    outputType: String,
    options: Map[String, String],
    fn: Column => Column)

final class ModelNotFoundException(msg: String) extends RuntimeException(msg)

class ModelRegistry {
  private val models =
    scala.collection.concurrent.TrieMap.empty[String, Vector[ModelVersion]]
  private val defaults = scala.collection.concurrent.TrieMap.empty[String, Int]

  /** CREATE MODEL (M1/M2). Re-creating a name adds a new version, like the
    * reference's versioned models (README.md:660-699 shows versions 1-4).
    */
  def create(
      name: String,
      task: String,
      inputType: String,
      outputType: String,
      options: Map[String, String],
      fn: Column => Column): Int = synchronized {
    val prev = models.getOrElse(name, Vector.empty)
    val v = prev.size + 1
    models(name) = prev :+ ModelVersion(v, task, inputType, outputType, options, fn)
    if (v == 1) defaults(name) = 1 // default = first created (README.md:718)
    v
  }

  /** ALTER MODEL name SET ('default_version'=v) (M5, README.md:712-714). */
  def setDefault(name: String, version: Int): Unit = {
    val vs = models.getOrElse(name,
      throw new ModelNotFoundException(s"model $name not found"))
    require(version >= 1 && version <= vs.size, s"no version $version of $name")
    defaults(name) = version
  }

  /** Resolve `name` or `name$version` (M4). */
  def resolve(ref: String): ModelVersion = {
    val (name, verOpt) = ref.indexOf('$') match {
      case -1 => (ref, None)
      case i  => (ref.substring(0, i), Some(ref.substring(i + 1).toInt))
    }
    val vs = models.getOrElse(name,
      throw new ModelNotFoundException(s"model $name not found"))
    val v = verOpt.getOrElse(defaults(name))
    vs.find(_.version == v).getOrElse(
      throw new ModelNotFoundException(s"model $name version $v not found"))
  }

  /** ML_PREDICT(model, col) (M6/J1/J3): per-row model invocation. The
    * reference exposes this as a lateral table-function join that is
    * 1-row-in/1-row-out (SURVEY §2.3 J1/J3), so a Column function — a
    * narrow, shuffle-free projection — is the Spark-native equivalent.
    */
  def mlPredict(ref: String, input: Column): Column = resolve(ref).fn(input)

  /** DESCRIBE MODEL m / m$all (M3, README.md:660-699). */
  def describe(spark: SparkSession, name: String, all: Boolean = false): DataFrame = {
    import spark.implicits._
    val vs = models.getOrElse(name,
      throw new ModelNotFoundException(s"model $name not found"))
    val d = defaults(name)
    val rows = (if (all) vs else vs.filter(_.version == d)).map { m =>
      (name, m.version, m.version == d, m.task, m.inputType, m.outputType,
        m.options.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(","))
    }
    rows.toDF("name", "version", "is_default", "task", "input", "output", "options")
  }

  def exists(name: String): Boolean = models.contains(name)
}

/** Deterministic stand-in for the reference's `retail_assistant` chat model
  * (README.md:469-480): prompt JSON in, assistant-answer JSON string out.
  * Template + stable hash — reproducible across runs and executors.
  */
object StubLlm {
  def respond(systemPrompt: String, prompt: String): String = {
    val p = if (prompt == null) "" else prompt
    val h = scala.util.hashing.MurmurHash3.stringHash(p, 42)
    val words = HashEmbedder.tokens(p).take(8).mkString(" ")
    val content =
      s"[$systemPrompt] Based on your request '$words', here is a deterministic answer (ref ${java.lang.Integer.toHexString(h)})."
    // Compact JSON, keys in fixed order — mirrors the provider envelope
    // shape (reference README.md:636-645) without any network call.
    s"""{"role":"assistant","content":"${content.replace("\\", "\\\\").replace("\"", "\\\"")}"}"""
  }

  def respondUdf(systemPrompt: String) =
    org.apache.spark.sql.functions.udf((prompt: String) => respond(systemPrompt, prompt))
}

/** The two models the reference registers, pre-wired (README.md:205-213,
  * 469-480), for use by the RAG pipeline and tests.
  */
object Models {
  val VectorEncoding = "vector_encoding"
  val RetailAssistant = "retail_assistant"

  def default(): ModelRegistry = {
    val r = new ModelRegistry
    r.create(
      VectorEncoding, task = "embedding", inputType = "STRING",
      outputType = "ARRAY<FLOAT>",
      options = Map("provider" -> "hash", "dim" -> HashEmbedder.DefaultDim.toString),
      fn = c => HashEmbedder.embedCol(c))
    r.create(
      RetailAssistant, task = "chat", inputType = "STRING", outputType = "STRING",
      options = Map("provider" -> "stub",
        "system_prompt" -> "You are a retail assistant"),
      fn = c => StubLlm.respondUdf("You are a retail assistant")(c))
    r
  }
}
