package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.functions.HashEmbedder
import graft.model.{ModelRegistry, StubLlm}
import graft.sources.TopicCatalog

/** SQL-text facade accepting the reference's Flink-SQL dialect VERBATIM —
  * the statements a reference user already has in their worksheets run
  * unchanged:
  *
  *  - `CREATE MODEL name INPUT (...) OUTPUT (...) [COMMENT '...'] WITH
  *    ('task'='embedding', ...)` (reference README.md:205-213, 469-480)
  *    → [[ModelRegistry.create]]; the provider wiring maps to the
  *    in-engine deterministic functions (hash embedder for
  *    task=embedding, stub LLM otherwise — this build is zero-egress).
  *  - `ALTER MODEL name SET ('default_version'='4')` (README.md:712-714)
  *    → [[ModelRegistry.setDefault]].
  *  - `DESCRIBE MODEL name` / `DESCRIBE MODEL name$all`
  *    (README.md:655-699) → [[ModelRegistry.describe]].
  *  - `CREATE TABLE name (cols) WITH ('value.format'='json-registry',
  *    ...)` (README.md:266-273) → [[TopicCatalog.create]]; the Flink
  *    column DDL (STRING / ARRAY<FLOAT> / ROW<...>) is Spark-DDL
  *    compatible, so the schema parses with `StructType.fromDDL` after
  *    backtick stripping.
  *  - anything else → `spark.sql` (Spark's own parser), so DML/queries
  *    over the created views work as usual.
  *
  * Statement routing is by leading keywords only — no shadow SQL parser;
  * each DDL form is matched with an anchored regex and everything else
  * is delegated, keeping this a thin adapter rather than a dialect fork.
  */
class GraftSql(
    spark: SparkSession,
    val topics: TopicCatalog,
    val registry: ModelRegistry = new ModelRegistry) {

  import GraftSql._

  /** Execute one statement; DDL forms return a small status/metadata
    * DataFrame, everything else returns whatever `spark.sql` returns.
    */
  def execute(sql: String): DataFrame = sql match {
    case CreateModelRe(name, in, out, comment, opts) =>
      val options0 = parseOptions(opts)
      val options =
        if (comment != null) options0 + ("comment" -> comment) else options0
      val task = options.getOrElse("task", "chat").toLowerCase
      val fn: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        if (task == "embedding") c => HashEmbedder.embedCol(c)
        else {
          val sys = options.getOrElse("openai.system_prompt",
            options.getOrElse("system_prompt", "You are a helpful assistant"))
          c => StubLlm.respondUdf(sys)(c)
        }
      val v = registry.create(name, task,
        inputType = typeOf(in), outputType = typeOf(out),
        options = options, fn = fn)
      status(s"created model $name version $v")

    case AlterModelRe(name, ver) =>
      registry.setDefault(name, ver.toInt)
      status(s"default_version of $name set to $ver")

    case DescribeModelRe(ref) =>
      val (name, all) = ref.indexOf('$') match {
        case -1 => (ref, false)
        case i  => (ref.substring(0, i), ref.substring(i + 1) == "all")
      }
      registry.describe(spark, name, all)

    case CreateTableRe(name, cols, opts) =>
      // Flink column DDL is Spark-DDL compatible once backticks drop;
      // the WITH options (connector/value.format) select the topic
      // backend, which in this engine is always the TopicCatalog.
      val schema = StructType.fromDDL(cols.replace("`", ""))
      topics.create(name, schema)
      val _ = parseOptions(opts) // validated shape; stored format is JSON lines
      status(s"created table $name")

    case other => spark.sql(other)
  }

  private def status(msg: String): DataFrame = {
    import spark.implicits._
    Seq(msg).toDF("status")
  }
}

object GraftSql {
  // (?is): case-insensitive, dot-matches-newline — statements arrive as
  // multi-line worksheet text, optionally ';'-terminated
  private val CreateModelRe =
    """(?is)^\s*CREATE\s+MODEL\s+`?([\w.-]+)`?\s*INPUT\s*\((.*?)\)\s*OUTPUT\s*\((.*?)\)\s*(?:COMMENT\s*'([^']*)')?\s*WITH\s*\((.*)\)\s*;?\s*$""".r
  private val AlterModelRe =
    """(?is)^\s*ALTER\s+MODEL\s+`?([\w.-]+)`?\s*SET\s*\(\s*'default_version'\s*=\s*'(\d+)'\s*\)\s*;?\s*$""".r
  private val DescribeModelRe =
    """(?is)^\s*DESCRIBE\s+MODEL\s+`?([\w.$-]+)`?\s*;?\s*$""".r
  private val CreateTableRe =
    """(?is)^\s*CREATE\s+TABLE\s+`?([\w.-]+)`?\s*\((.*)\)\s*WITH\s*\((.*?)\)\s*;?\s*$""".r

  /** `'k' = 'v', ...` option lists; keys normalized to lowercase (the
    * reference mixes 'TASK' and 'task' across transcripts).
    */
  def parseOptions(s: String): Map[String, String] =
    "'([^']*)'\\s*=\\s*'([^']*)'".r.findAllMatchIn(s)
      .map(m => m.group(1).toLowerCase -> m.group(2)).toMap

  /** INPUT/OUTPUT clause like "input STRING" / "vector ARRAY<FLOAT>" —
    * the declared type is the part after the first identifier.
    */
  private def typeOf(clause: String): String =
    clause.replace("`", "").trim.split("\\s+", 2) match {
      case Array(_, t) => t.trim
      case _           => clause.trim
    }
}
