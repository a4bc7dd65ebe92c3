package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** In-engine replacement for the reference's connection resources — the
  * named, credentialed endpoints its models and search tables reference
  * by name (`'openai.connection' = 'openai-vector-connection'`,
  * `'mongodb.connection' = 'mongodb-fed-search-connection'`).
  *
  * The reference creates them with the `confluent flink connection
  * create` CLI (reference README.md:53-60 embedding endpoint, 67-74
  * vector DB, 79-86 LLM endpoint, 90-96 Azure variant, 321-329 the
  * fed-search retry) and hits a documented failure mode when a statement
  * references one that does not exist in the environment:
  * `Error details: Connection 'mongodb-connection' not found`
  * (README.md:310-316). This catalog preserves both behaviors: the
  * verbatim CLI text parses straight in, and [[resolve]] raises the
  * reference's exact error sentence.
  *
  * Connections are driver-side config objects only (this engine performs
  * no egress — every provider is a deterministic local implementation),
  * so credentials never reach executors; [[describe]] masks every
  * secret-bearing flag.
  */
final case class Connection(
    name: String,
    connType: String,
    cloud: String,
    region: String,
    environment: String,
    endpoint: String,
    secrets: Map[String, String])

final class ConnectionNotFoundException(msg: String) extends RuntimeException(msg)

class ConnectionCatalog {
  private val conns =
    scala.collection.concurrent.TrieMap.empty[String, Connection]

  /** Flags whose values are credentials — masked by [[describe]]. */
  private val SecretFlags = Set("api-key", "password", "username")

  /** Register a connection from the VERBATIM `confluent flink connection
    * create` CLI block (reference README.md:53-60). Accepts the README's
    * exact formatting: backslash line continuations, `--flag value`
    * pairs, single-quoted or `${var}` values (kept literal).
    */
  def createFromCli(cli: String): Connection = {
    val toks = tokenize(cli.replace("\\\r\n", " ").replace("\\\n", " "))
    val (head, rest) = toks.span(!_.startsWith("--"))
    require(head.containsSlice(Seq("connection", "create")) && head.last != "create",
      s"not a connection create command: ${cli.linesIterator.next()}")
    val name = head.last
    // strict --flag value alternation: a valueless flag would silently
    // shift every later pair under grouped(2), so reject it loudly
    val flags = rest.grouped(2).map {
      case Seq(k, v) if k.startsWith("--") && !v.startsWith("--") =>
        k.stripPrefix("--") -> unquote(v)
      case bad => throw new IllegalArgumentException(
        s"connection create: malformed flag pair '${bad.mkString(" ")}' — " +
          "expected --flag value")
    }.toMap
    val c = Connection(
      name = name,
      connType = flags.getOrElse("type", ""),
      cloud = flags.getOrElse("cloud", ""),
      region = flags.getOrElse("region", ""),
      environment = flags.getOrElse("environment", ""),
      endpoint = flags.getOrElse("endpoint", ""),
      secrets = flags.view.filterKeys(SecretFlags).toMap)
    conns(name) = c
    c
  }

  def create(c: Connection): Unit = conns(c.name) = c

  /** The reference's exact failure sentence for a dangling reference
    * (README.md:315): `Connection 'mongodb-connection' not found`.
    */
  def resolve(name: String): Connection =
    conns.getOrElse(name,
      throw new ConnectionNotFoundException(s"Connection '$name' not found"))

  def exists(name: String): Boolean = conns.contains(name)

  /** One row per connection, credentials masked (`<hidden>` per secret
    * flag present) — config is driver metadata, never data.
    */
  def describe(spark: SparkSession): DataFrame = {
    import spark.implicits._
    conns.values.toSeq.sortBy(_.name).map { c =>
      (c.name, c.connType, c.cloud, c.region, c.environment, c.endpoint,
        c.secrets.keys.toSeq.sorted.map(k => s"$k=<hidden>").mkString(","))
    }.toDF("name", "type", "cloud", "region", "environment", "endpoint", "credentials")
  }

  private def unquote(s: String): String =
    if (s.length >= 2 && s.head == '\'' && s.last == '\'') s.substring(1, s.length - 1)
    else s

  private def tokenize(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && s(i).isWhitespace) i += 1
      if (i < n) {
        val start = i
        if (s(i) == '\'') {
          i += 1
          while (i < n && s(i) != '\'') i += 1
          i = math.min(n, i + 1)
        } else {
          while (i < n && !s(i).isWhitespace) i += 1
        }
        out += s.substring(start, i)
      }
    }
    out.toSeq
  }
}

/** The reference's connection set, pre-wired from its verbatim CLI blocks. */
object Connections {
  def default(): ConnectionCatalog = {
    val c = new ConnectionCatalog
    // reference README.md:53-60
    c.createFromCli("""confluent flink connection create openai-vector-connection \
--cloud aws \
--region us-west-2 \
--environment my-env-id \
--type openai \
--endpoint 'https://api.openai.com/v1/embeddings' \
--api-key '<your-openai-api-key>'""")
    // reference README.md:67-74
    c.createFromCli("""confluent flink connection create mongodb-connection \
  --cloud aws \
  --region us-west-2 \
  --type mongodb \
  --endpoint ${atlas_endpoint} \
  --username ${atlas_username} \
  --password ${atlas_password}""")
    // reference README.md:79-86
    c.createFromCli("""confluent flink connection create openai-llm-connection \
--cloud aws \
--region us-west-2 \
--environment my-env-id \
--type openai \
--endpoint 'https://api.openai.com/v1/chat/completions' \
--api-key '<your-openai-api-key>'""")
    // reference README.md:321-329 (the fed-search retry with environment)
    c.createFromCli("""confluent flink connection create mongodb-fed-search-connection \
  --cloud aws \
  --region us-west-2 \
  --type mongodb \
  --environment my-environment-id \
  --endpoint ${atlas_endpoint} \
  --username ${atlas_username} \
  --password ${atlas_password}""")
    c
  }
}
