package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.functions.HashEmbedder
import graft.model.{ModelRegistry, StubLlm}
import graft.operators.VectorSearch
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

  /** Output column name per model (from the DDL's OUTPUT clause) — what a
    * `LATERAL TABLE(ML_PREDICT(...))` join exposes to the SELECT list.
    */
  private val outputNames =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Registered FEDERATED_SEARCH corpora: name -> (collected rows of
    * (content, vector), metric). Bounded collect — the reference's Atlas
    * index is the broadcast side of its search (README.md:404-407); cap
    * with `maxRows` like [[VectorSearch.topKBroadcast]].
    */
  private val corpora = scala.collection.concurrent.TrieMap
    .empty[String, Array[(String, Array[Float])]]

  /** Register the backing corpus for `FEDERATED_SEARCH('<name>', k, v)`
    * statements — the in-engine stand-in for the reference's external
    * Atlas collection (contentCol, vecCol projected and collected under a
    * row cap).
    */
  def registerSearchCorpus(
      name: String, df: DataFrame, contentCol: String, vecCol: String,
      maxRows: Int = 2000000): Unit = {
    val rows = df.select(contentCol, vecCol).limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"corpus $name exceeds maxRows=$maxRows; use the DataFrame API " +
        "(VectorSearch.topKAgg/annTopK) for beyond-broadcast corpora")
    corpora(name) = rows.map(r =>
      (r.getString(0), r.getSeq[Float](1).toArray))
  }

  /** Execute one statement; DDL forms return a small status/metadata
    * DataFrame, everything else returns whatever `spark.sql` returns.
    */
  def execute(sql0: String): DataFrame = rewriteDml(sql0) match {
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
      outputNames(name) = nameOf(out)
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
      // Flink column DDL is Spark-DDL compatible once backticks drop and
      // ROW<...> becomes STRUCT<...>; the WITH options (connector/
      // value.format) select the topic backend, which in this engine is
      // always the TopicCatalog.
      val schema = StructType.fromDDL(
        cols.replace("`", "").replaceAll("(?i)\\bROW<", "STRUCT<"))
      topics.create(name, schema)
      val _ = parseOptions(opts) // validated shape; stored format is JSON lines
      status(s"created table $name")

    case InsertIntoRe(table, colList, select) =>
      // INSERT INTO topic [(cols)] SELECT ... — the reference's perpetual
      // pipeline statement (README.md:285-287, 432-445, ~723), batch form:
      // run the SELECT, map positional column names if a list is given,
      // append through the catalog's schema-checked insert.
      val df0 = execute(select)
      val df = Option(colList) match {
        case Some(cl) =>
          val names = cl.split(",").map(_.trim.replace("`", "")).filter(_.nonEmpty)
          require(names.length == df0.columns.length,
            s"INSERT column list (${names.length}) != SELECT width (${df0.columns.length})")
          df0.toDF(names.toIndexedSeq: _*)
        case None => df0
      }
      topics.insertInto(table, df)
      status(s"inserted into $table")

    case other => spark.sql(other)
  }

  // --- verbatim-DML rewrites ----------------------------------------------

  /** Text-level rewrites that map the reference's Flink-only DML forms
    * onto Spark-parsable equivalents, applied before routing:
    *  - `JSON_OBJECT('k' VALUE v, ...)` → `to_json(named_struct('k', v, ...))`
    *    (README.md:434-439; Spark has no VALUE syntax).
    *  - `FROM t, LATERAL TABLE(ML_PREDICT('m', arg))` →
    *    `FROM (SELECT *, <model-udf>(arg) AS <output-name> FROM t) AS t`
    *    — the reference's 1-row-in/1-row-out lateral (README.md:279-287)
    *    as a narrow projection; the subquery is aliased with the table
    *    name so qualified refs in the SELECT list keep resolving.
    *  - `FROM t, LATERAL TABLE(FEDERATED_SEARCH('corpus', k, v))` →
    *    same shape with a broadcast top-k UDF producing `search_results`
    *    (README.md:425-431); corpus registered via
    *    [[registerSearchCorpus]].
    */
  private def rewriteDml(sql: String): String =
    rewriteLateral(rewriteJsonObject(sql))

  private def rewriteJsonObject(sql: String): String = {
    val lower = sql.toLowerCase
    val at = lower.indexOf("json_object")
    if (at < 0) return sql
    val open = sql.indexOf('(', at)
    if (open < 0) return sql
    val close = matchParen(sql, open)
    val inner = sql.substring(open + 1, close)
    val rewrittenInner = inner.replaceAll("(?i)'\\s+VALUE\\s+", "', ")
      .replaceAll("(?i)(?<=')\\s+VALUE\\s+", ", ")
    val replaced = sql.substring(0, at) +
      s"to_json(named_struct($rewrittenInner))" + sql.substring(close + 1)
    rewriteJsonObject(replaced) // handle multiple occurrences
  }

  private def rewriteLateral(sql: String): String = {
    val m = LateralRe.findFirstMatchIn(sql)
    if (m.isEmpty) return sql
    val mm = m.get
    val table = mm.group(1).replace("`", "")
    val fnKind = mm.group(2).toLowerCase // ml_predict | federated_search
    val open = sql.indexOf('(', mm.end(2))
    val close = matchParen(sql, open)
    val args = sql.substring(open + 1, close)
    // LATERAL TABLE's own closing paren: first non-whitespace after the
    // function call must close the lateral
    var lc = close + 1
    while (lc < sql.length && sql.charAt(lc).isWhitespace) lc += 1
    require(lc < sql.length && sql.charAt(lc) == ')',
      s"malformed LATERAL TABLE near: ${sql.substring(mm.start, math.min(sql.length, mm.start + 80))}")
    val lateralClose = lc
    val (call, outName) = fnKind match {
      case "ml_predict" =>
        val (ref, arg) = splitFirstArg(args)
        (s"${mlPredictUdf(ref)}($arg)",
          outputNames.getOrElse(ref.takeWhile(_ != '$'), "json_response"))
      case _ =>
        val parts = splitArgs(args)
        require(parts.length == 3,
          s"FEDERATED_SEARCH expects ('corpus', k, vectorCol), got: $args")
        val corpus = unquote(parts(0))
        (s"${federatedSearchUdf(corpus, parts(1).trim.toInt)}(${parts(2)})",
          "search_results")
    }
    val prefix = sql.substring(0, mm.start)
    val suffix = sql.substring(lateralClose + 1)
    val rewritten =
      s"$prefix FROM (SELECT *, $call AS $outName FROM $table) AS $table $suffix"
    rewriteLateral(rewritten)
  }

  /** Register (idempotently) a scalar UDF evaluating the resolved model
    * and return its name. Output type follows the model task: embedding
    * → ARRAY<FLOAT>, otherwise STRING.
    */
  private def mlPredictUdf(ref: String): String = {
    val resolved = registry.resolve(ref) // fails fast on unknown ref
    val fname = ("ml_predict__" + ref).replaceAll("[^\\w]", "_")
    if (resolved.task == "embedding")
      spark.udf.register(fname, (s: String) => HashEmbedder.embed(s, HashEmbedder.DefaultDim))
    else {
      val sys = resolved.options.getOrElse("openai.system_prompt",
        resolved.options.getOrElse("system_prompt", "You are a helpful assistant"))
      spark.udf.register(fname, (s: String) => StubLlm.respond(sys, s))
    }
    fname
  }

  /** Register (idempotently) the broadcast top-k UDF for a corpus and
    * return its name: dot-product scoring over the collected corpus, best
    * k contents as ARRAY<STRUCT<content STRING>> (the reference's
    * `search_results` shape, README.md:417,425-431).
    */
  private def federatedSearchUdf(corpus: String, k: Int): String = {
    val rows = corpora.getOrElse(corpus, throw new IllegalArgumentException(
      s"unknown search corpus '$corpus' — call registerSearchCorpus first"))
    val fname = s"federated_search__${corpus}__$k".replaceAll("[^\\w]", "_")
    spark.udf.register(fname, (v: Seq[Float]) => {
      val q = if (v == null) Array.empty[Float] else v.toArray
      rows.map { case (content, cv) =>
        (content, VectorSearch.scoreF32("dot", q, cv))
      }.sortBy { case (c, s) => (-s, c) }.take(k).map(p => SearchHit(p._1)).toSeq
    })
    fname
  }

  private def status(msg: String): DataFrame = {
    import spark.implicits._
    Seq(msg).toDF("status")
  }
}

/** `search_results` element shape (ARRAY<ROW<content STRING>>). */
case class SearchHit(content: String)

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
  private val InsertIntoRe =
    """(?is)^\s*INSERT\s+INTO\s+`?([\w.-]+)`?\s*(?:\(([^)]*)\))?\s*(SELECT\b.*?)\s*;?\s*$""".r
  private[sql] val LateralRe =
    """(?is)\bFROM\s+(`?[\w.]+`?)\s*,\s*LATERAL\s+TABLE\s*\(\s*(ML_PREDICT|FEDERATED_SEARCH)\b""".r

  /** Index of the ')' matching the '(' at `open` (quote-aware). */
  private[sql] def matchParen(s: String, open: Int): Int = {
    require(open >= 0 && s.charAt(open) == '(', s"no '(' at $open")
    var depth = 0
    var inQuote = false
    var i = open
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQuote) { if (c == '\'') inQuote = false }
      else c match {
        case '\'' => inQuote = true
        case '('  => depth += 1
        case ')'  => depth -= 1; if (depth == 0) return i
        case _    => ()
      }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced parens from $open in: $s")
  }

  /** Split a top-level argument list (quote- and paren-aware). */
  private[sql] def splitArgs(args: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var inQuote = false
    var start = 0
    var i = 0
    while (i < args.length) {
      val c = args.charAt(i)
      if (inQuote) { if (c == '\'') inQuote = false }
      else c match {
        case '\'' => inQuote = true
        case '('  => depth += 1
        case ')'  => depth -= 1
        case ',' if depth == 0 =>
          out += args.substring(start, i); start = i + 1
        case _ => ()
      }
      i += 1
    }
    out += args.substring(start)
    out.map(_.trim).toSeq
  }

  /** ('ref', rest-of-args) for ML_PREDICT — rest may itself contain
    * commas/parens (a json_object/named_struct expression).
    */
  private[sql] def splitFirstArg(args: String): (String, String) = {
    val parts = splitArgs(args)
    (unquote(parts.head), parts.tail.mkString(", "))
  }

  private[sql] def unquote(s: String): String = {
    val t = s.trim
    if (t.startsWith("'") && t.endsWith("'")) t.substring(1, t.length - 1) else t
  }

  /** Column NAME of a single-column INPUT/OUTPUT clause. */
  private def nameOf(clause: String): String =
    clause.replace("`", "").trim.split("\\s+", 2).head

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
