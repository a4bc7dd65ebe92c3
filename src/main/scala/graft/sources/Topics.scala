package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** In-engine equivalent of the reference's topic-backed dynamic tables
  * (SURVEY §1.1, §2.1): a named, schema-registered, append-only table of
  * JSON records.
  *
  * Mapping from the reference:
  *  - `CREATE TABLE ... WITH ('value.format'='json-registry')`
  *    (README.md:266-274) -> [[TopicCatalog.create]]: registers the
  *    schema, creates the backing directory ("the topic"), exposes a
  *    temp view.
  *  - Implicit `key BYTES ... BUCKET KEY` first column on every topic
  *    table (README.md:551) -> every scan/describe carries a leading
  *    nullable `key BINARY`; records produced without a key read null.
  *  - UI/manual produce of one JSON record (README.md:187-195) ->
  *    [[TopicCatalog.produceJson]].
  *  - `INSERT INTO ... SELECT` (README.md:286-288, 438-446) ->
  *    [[TopicCatalog.insertInto]] (batch) — the streaming form is
  *    graft.streaming.Streams over [[TopicCatalog.stream]].
  *  - `INSERT INTO ... VALUES` with `ARRAY[ROW(...)]` literals
  *    (README.md:616-623) -> [[TopicCatalog.insertValues]] or plain
  *    `spark.sql("INSERT INTO ... VALUES (named_struct(...))")`.
  *  - `DESCRIBE table` (README.md:543-556) -> [[TopicCatalog.describe]]
  *    (col_name, data_type, nullable, extras — `BUCKET KEY` on key).
  *  - Schema-mismatch INSERT fails at submit time, like the reference's
  *    sink/query mismatch error (README.md:586-594).
  *  - Degenerate `ROW<>` (a JSON "object" column modeled with no fields)
  *    is rejected at CREATE time: in the reference it poisons every
  *    INSERT with an unfixable sink-mismatch (README.md:586-598) and the
  *    fix is to model the fields (README.md:600-608) — fail fast instead.
  *  - Schema evolution: the reference auto-updates the Flink table when
  *    the registry schema evolves (README.md:610-612) ->
  *    [[TopicCatalog.evolve]] (append-only: existing fields keep name and
  *    type; new nullable fields appear on the next scan; old records read
  *    them as null).
  *
  * Records are JSON lines on disk — the same row-oriented, schema-on-read
  * contract as JSON-on-Kafka (README.md:190,272). At scale the backing
  * store would be Kafka or an object store; every reader goes through the
  * same `spark.read.schema(...).json(dir)` path either way, so Catalyst
  * sees an ordinary datasource with pushdown and pruning.
  */
class TopicCatalog(spark: SparkSession, root: String) {

  /** Declared (value) schema per topic; scans prepend [[TopicCatalog.KeyField]]. */
  private val registry = scala.collection.concurrent.TrieMap.empty[String, StructType]

  /** Per-topic configs (Kafka topic-config shape: `cleanup.policy`,
    * `compaction.ordering`, retention knobs — free-form strings).
    */
  private val configs =
    scala.collection.concurrent.TrieMap.empty[String, Map[String, String]]

  private def dir(name: String) = s"$root/$name"

  /** CREATE TABLE (S2): register schema + create the topic dir + view.
    * `props` carries topic configs; `'cleanup.policy'='compact'` marks
    * the topic keyed-compacted (with `'compaction.ordering'='col[,col…]'`
    * naming the winner ordering), mirroring Kafka's topic-level config.
    */
  def create(name: String, schema: StructType,
      props: Map[String, String] = Map.empty): Unit = {
    require(!registry.contains(name), s"topic $name already exists")
    require(!schema.fieldNames.contains(TopicCatalog.KeyField.name),
      s"column '${TopicCatalog.KeyField.name}' is implicit on every topic table")
    TopicCatalog.rejectDegenerateRows(name, schema)
    if (props.get("cleanup.policy").contains("compact")) {
      val ordering = compactionOrdering(props)
      require(ordering.nonEmpty,
        s"topic $name: cleanup.policy=compact requires 'compaction.ordering'")
      ordering.foreach(c => require(schema.fieldNames.contains(c),
        s"topic $name: compaction.ordering column '$c' not in schema"))
    }
    registry(name) = schema
    configs(name) = props
    Files.createDirectories(Paths.get(dir(name)))
    refreshView(name)
  }

  /** Declared topic configs (empty map for pre-config topics). */
  def configsOf(name: String): Map[String, String] =
    configs.getOrElse(name, Map.empty)

  private def compactionOrdering(props: Map[String, String]): Seq[String] =
    props.getOrElse("compaction.ordering", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq

  /** Run the topic's declared maintenance: keyed compaction when
    * `cleanup.policy=compact` (latest per key by the declared ordering,
    * tombstones applied), small-file consolidation otherwise. Returns
    * files removed.
    */
  def compactByPolicy(name: String): Int = {
    val props = configsOf(name)
    if (props.get("cleanup.policy").contains("compact")) {
      val ordering = compactionOrdering(props)
      compactKeyed(name, ordering.head, ordering.tail)
    } else compact(name)
  }

  /** Schema evolution (reference README.md:610-612): the table definition
    * follows the registry. Append-only compatibility — every existing
    * field must survive with an identical type; added fields read as null
    * from pre-evolution records (PERMISSIVE schema-on-read).
    */
  def evolve(name: String, newSchema: StructType): Unit = {
    val old = valueSchemaOf(name)
    TopicCatalog.rejectDegenerateRows(name, newSchema)
    require(!newSchema.fieldNames.contains(TopicCatalog.KeyField.name),
      s"column '${TopicCatalog.KeyField.name}' is implicit on every topic table")
    old.fields.foreach { f =>
      val kept = newSchema.fields.find(_.name == f.name).getOrElse(
        throw new IllegalArgumentException(
          s"evolve $name: incompatible evolution drops field '${f.name}'"))
      if (kept.dataType != f.dataType)
        throw new IllegalArgumentException(
          s"evolve $name: incompatible type change for '${f.name}' " +
            s"(${f.dataType.simpleString} -> ${kept.dataType.simpleString})")
    }
    registry(name) = newSchema
    refreshView(name)
  }

  /** Declared value schema (what CREATE registered). */
  def valueSchemaOf(name: String): StructType =
    registry.getOrElse(name, throw new IllegalArgumentException(s"unknown topic $name"))

  /** Whether `name` is a registered topic (drives the SQL facade's
    * create-vs-evolve routing for re-issued CREATE TABLE).
    */
  def exists(name: String): Boolean = registry.contains(name)

  /** Read schema: implicit bucket-key column + declared fields. */
  def schemaOf(name: String): StructType =
    StructType(TopicCatalog.KeyField +: valueSchemaOf(name).fields)

  /** Schema-on-read scan of the topic (schemaless bytes + registered
    * schema, SURVEY §1.2). PERMISSIVE like Flink's registry decode:
    * fields absent from a record read as null; extra fields are ignored.
    */
  def table(name: String): DataFrame =
    spark.read.schema(schemaOf(name)).json(dir(name))

  /** Streaming scan — the "dynamic" in dynamic table (ST1). */
  def stream(name: String): DataFrame =
    spark.readStream.schema(schemaOf(name)).json(dir(name))

  /** The SQL temp view snapshots the file listing at registration time;
    * re-register after every produce/insert so `spark.sql` over the view
    * always sees the latest records. Public so streaming drivers can
    * restore the full view after shadowing it with a micro-batch slice.
    */
  def refreshView(name: String): Unit =
    table(name).createOrReplaceTempView(name)

  /** Manual produce (S5): append raw JSON records (one per line). */
  def produceJson(name: String, records: Seq[String]): Unit = {
    valueSchemaOf(name) // existence check
    val path = Paths.get(dir(name), s"produce-${System.nanoTime()}.json")
    Files.write(path, records.mkString("", "\n", "\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    refreshView(name)
  }

  /** INSERT INTO ... VALUES (S7): typed rows against the declared value
    * schema, incl. complex values (the key is produced null, like an
    * unkeyed Kafka record).
    */
  def insertValues(name: String, rows: Row*): Unit =
    insertInto(name, spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), valueSchemaOf(name)))

  /** INSERT INTO ... SELECT (S6, batch): columns are matched by NAME
    * against the registered schema; a mismatch fails at submit time
    * exactly like the reference's sink-schema error (README.md:586-594).
    * The implicit key column may be supplied or omitted (reads null).
    */
  def insertInto(name: String, df: DataFrame): Unit = {
    val target = valueSchemaOf(name)
    val withKey = df.schema.fieldNames.contains(TopicCatalog.KeyField.name)
    val targetNames =
      if (withKey) TopicCatalog.KeyField.name +: target.fieldNames.toSeq
      else target.fieldNames.toSeq
    val missing = target.fieldNames.toSet -- df.schema.fieldNames.toSet
    val extra = df.schema.fieldNames.toSet -- targetNames.toSet
    if (missing.nonEmpty || extra.nonEmpty)
      throw new IllegalArgumentException(
        s"insert into $name: schema mismatch (missing=$missing, unexpected=$extra)")
    df.select(targetNames.map(col): _*)
      .write.option("timestampFormat", TopicCatalog.TsWriteFormat)
      .mode("append").json(dir(name))
    refreshView(name)
  }

  /** DESCRIBE (P5): one row per column with the reference transcript's
    * shape (README.md:543-556) — the implicit key leads with extras
    * `BUCKET KEY`.
    */
  def describe(name: String): DataFrame = {
    import spark.implicits._
    schemaOf(name).fields.map { f =>
      val extras = if (f.name == TopicCatalog.KeyField.name) "BUCKET KEY" else ""
      (f.name, f.dataType.simpleString, f.nullable, extras)
    }.toSeq.toDF("col_name", "data_type", "nullable", "extras")
  }

  /** Compact a topic's accumulated small files. Append-only topics gain
    * one file per produce/insert; at scale the file LISTING becomes the
    * scan bottleneck long before the bytes do (every reader stats every
    * file). Rewrites the current snapshot into `targetFiles`
    * consolidated files, then removes the snapshot's originals.
    *
    * Visibility: add-then-remove — a crash between the stages leaves
    * records temporarily DUPLICATED (at-least-once, like an in-flight
    * Kafka log compaction), never lost; re-running compact converges. A
    * production store would swap a manifest atomically instead of
    * renaming files; the reader contract (scan the directory) is
    * unchanged either way.
    *
    * Returns the number of original files removed.
    */
  def compact(name: String, targetFiles: Int = 1): Int = {
    valueSchemaOf(name) // existence check
    val topicDir = Paths.get(dir(name))
    val originals = Files.list(topicDir).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".json"))
      .toVector
    if (originals.isEmpty) return 0
    // snapshot through the same schema-on-read path every reader uses
    val staged = Files.createTempDirectory(topicDir, ".compact-")
    table(name).coalesce(targetFiles)
      .write.option("timestampFormat", TopicCatalog.TsWriteFormat)
      .mode("overwrite").json(staged.toString)
    // stage in: consolidated parts become visible under unique names
    Files.list(staged).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("part-"))
      .zipWithIndex.foreach { case (p, i) =>
        Files.move(p, topicDir.resolve(s"compact-${System.nanoTime()}-$i.json"))
      }
    // stage out: drop the snapshot's originals (new appends since the
    // listing above are untouched)
    originals.foreach(Files.deleteIfExists(_))
    // clean staging leftovers (_SUCCESS etc.)
    Files.list(staged).iterator().asScala.foreach(Files.deleteIfExists(_))
    Files.deleteIfExists(staged)
    refreshView(name)
    originals.size
  }

  /** Produce a CDC-style tombstone: the record that deletes `key` under
    * keyed compaction. Kafka's tombstone is key + null value; a delete
    * in a changelog additionally carries its ordering position (a CDC
    * delete event ships its commit timestamp), so the tombstone here is
    * key + the `orderVals` fields + every other value field null. Until
    * [[compactKeyed]] runs, scans see it as an ordinary (mostly-null)
    * record — exactly a compacted Kafka topic's read behavior before
    * the cleaner has processed the segment.
    */
  def tombstone(name: String, key: Array[Byte], orderVals: Map[String, Any]): Unit = {
    val schema = valueSchemaOf(name)
    val unknown = orderVals.keySet -- schema.fieldNames.toSet
    require(unknown.isEmpty, s"tombstone $name: unknown ordering fields $unknown")
    val full = StructType(TopicCatalog.KeyField +: schema.fields)
    val row = Row.fromSeq(key +: schema.fields.toSeq.map(f => orderVals.get(f.name).orNull))
    spark.createDataFrame(java.util.Arrays.asList(row), full)
      .write.option("timestampFormat", TopicCatalog.TsWriteFormat)
      .mode("append").json(dir(name))
    refreshView(name)
  }

  /** Keyed (Kafka `cleanup.policy=compact`) compaction: rewrite the
    * topic keeping only the LATEST record per key, ordered by
    * `orderCol` (+ `tiebreaks` — include a unique one for determinism),
    * and dropping keys whose winner is a tombstone (every value field
    * null apart from the ordering columns). Records must all carry a
    * key: Kafka rejects unkeyed produce to compacted topics, enforced
    * here at compact time.
    *
    * Same add-then-remove visibility contract as [[compact]]
    * (at-least-once under a crash, convergent on re-run). The winner
    * computation is [[graft.operators.Compaction.latestByKey]] — one
    * hash shuffle with map-side partial aggregation, no sort.
    *
    * Returns the number of original files removed.
    */
  def compactKeyed(name: String, orderCol: String,
      tiebreaks: Seq[String] = Nil, targetFiles: Int = 1): Int = {
    val schema = valueSchemaOf(name)
    (orderCol +: tiebreaks).foreach(c => require(schema.fieldNames.contains(c),
      s"compactKeyed $name: unknown ordering column '$c'"))
    val topicDir = Paths.get(dir(name))
    val originals = Files.list(topicDir).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".json"))
      .toVector
    if (originals.isEmpty) return 0
    val snap = table(name)
    if (snap.filter(col(TopicCatalog.KeyField.name).isNull).limit(1).count() > 0)
      throw new IllegalStateException(
        s"compactKeyed $name: unkeyed record present — compacted topics require a key")
    val winners = graft.operators.Compaction.latestByKey(
      snap, Seq(TopicCatalog.KeyField.name), orderCol +: tiebreaks)
    val orderSet = (orderCol +: tiebreaks).toSet
    val deadCols = schema.fieldNames.toSeq.filterNot(orderSet.contains)
    val live =
      if (deadCols.isEmpty) winners
      else winners.filter(!deadCols.map(col(_).isNull).reduce(_ && _))
    // targetFiles sizes the rewritten snapshot (1 suits local topics; a
    // production compaction would size by bytes-per-file instead)
    val staged = Files.createTempDirectory(topicDir, ".compact-")
    live.coalesce(targetFiles)
      .write.option("timestampFormat", TopicCatalog.TsWriteFormat)
      .mode("overwrite").json(staged.toString)
    Files.list(staged).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("part-"))
      .zipWithIndex.foreach { case (p, i) =>
        Files.move(p, topicDir.resolve(s"compact-${System.nanoTime()}-$i.json"))
      }
    originals.foreach(Files.deleteIfExists(_))
    Files.list(staged).iterator().asScala.foreach(Files.deleteIfExists(_))
    Files.deleteIfExists(staged)
    refreshView(name)
    originals.size
  }

  def drop(name: String): Unit = {
    registry.remove(name)
    spark.catalog.dropTempView(name)
  }
}

object TopicCatalog {
  /** The implicit Kafka record key on every topic table (README.md:551). */
  val KeyField: StructField = StructField("key", BinaryType, nullable = true)

  /** JSON write format for timestamp fields: full microsecond precision.
    * Spark's default JSON `timestampFormat` truncates to milliseconds on
    * WRITE; reads keep the default (its fallback parser accepts both the
    * milli and micro forms, so manually-produced records stay readable).
    */
  val TsWriteFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  /** Analysis-time rejection of degenerate `ROW<>` anywhere in the schema
    * (fields, array elements, map values) — SURVEY §1.5 / README.md:586-598.
    */
  private[sources] def rejectDegenerateRows(topic: String, schema: StructType): Unit = {
    def check(path: String, dt: DataType): Unit = dt match {
      case s: StructType if s.fields.isEmpty =>
        throw new IllegalArgumentException(
          s"topic $topic: column '$path' is a degenerate ROW<> — JSON object " +
            "columns must model their fields (reference README.md:586-608)")
      case s: StructType => s.fields.foreach(f => check(s"$path.${f.name}", f.dataType))
      case a: ArrayType => check(s"$path[]", a.elementType)
      case m: MapType => check(s"$path{}", m.valueType)
      case _ => ()
    }
    schema.fields.foreach(f => check(f.name, f.dataType))
  }
}
