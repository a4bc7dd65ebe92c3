package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** In-engine equivalent of the reference's topic-backed dynamic tables
  * (SURVEY §1.1, §2.1): a named, schema-registered, append-only table of
  * JSON records.
  *
  * Mapping from the reference:
  *  - `CREATE TABLE ... WITH ('value.format'='json-registry')`
  *    (README.md:266-274) -> [[TopicCatalog.create]]: registers the
  *    schema, creates the backing directory ("the topic"), exposes a
  *    temp view.
  *  - UI/manual produce of one JSON record (README.md:187-195) ->
  *    [[TopicCatalog.produceJson]].
  *  - `INSERT INTO ... SELECT` (README.md:286-288, 438-446) ->
  *    [[TopicCatalog.insertInto]] (batch) — the streaming form is
  *    graft.streaming.Streams over [[TopicCatalog.stream]].
  *  - `INSERT INTO ... VALUES` with `ARRAY[ROW(...)]` literals
  *    (README.md:616-623) -> [[TopicCatalog.insertValues]] or plain
  *    `spark.sql("INSERT INTO ... VALUES (named_struct(...))")`.
  *  - `DESCRIBE table` (README.md:543-556) -> [[TopicCatalog.describe]].
  *  - Schema-mismatch INSERT fails at submit time, like the reference's
  *    sink/query mismatch error (README.md:586-594).
  *
  * Records are JSON lines on disk — the same row-oriented, schema-on-read
  * contract as JSON-on-Kafka (README.md:190,272). At scale the backing
  * store would be Kafka or an object store; every reader goes through the
  * same `spark.read.schema(...).json(dir)` path either way, so Catalyst
  * sees an ordinary datasource with pushdown and pruning.
  */
class TopicCatalog(spark: SparkSession, root: String) {

  private val registry = scala.collection.concurrent.TrieMap.empty[String, StructType]

  private def dir(name: String) = s"$root/$name"

  /** CREATE TABLE (S2): register schema + create the topic dir + view. */
  def create(name: String, schema: StructType): Unit = {
    require(!registry.contains(name), s"topic $name already exists")
    registry(name) = schema
    Files.createDirectories(Paths.get(dir(name)))
    table(name).createOrReplaceTempView(name)
  }

  def schemaOf(name: String): StructType =
    registry.getOrElse(name, throw new IllegalArgumentException(s"unknown topic $name"))

  /** Schema-on-read scan of the topic (schemaless bytes + registered
    * schema, SURVEY §1.2). PERMISSIVE like Flink's registry decode:
    * fields absent from a record read as null; extra fields are ignored.
    */
  def table(name: String): DataFrame =
    spark.read.schema(schemaOf(name)).json(dir(name))

  /** Streaming scan — the "dynamic" in dynamic table (ST1). */
  def stream(name: String): DataFrame =
    spark.readStream.schema(schemaOf(name)).json(dir(name))

  /** Manual produce (S5): append raw JSON records (one per line). */
  def produceJson(name: String, records: Seq[String]): Unit = {
    schemaOf(name) // existence check
    val path = Paths.get(dir(name), s"produce-${System.nanoTime()}.json")
    Files.write(path, records.mkString("", "\n", "\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** INSERT INTO ... VALUES (S7): typed rows, incl. complex values. */
  def insertValues(name: String, rows: Row*): Unit =
    insertInto(name, spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schemaOf(name)))

  /** INSERT INTO ... SELECT (S6, batch): columns are matched by NAME
    * against the registered schema; a mismatch fails at submit time
    * exactly like the reference's sink-schema error (README.md:586-594).
    */
  def insertInto(name: String, df: DataFrame): Unit = {
    val target = schemaOf(name)
    val missing = target.fieldNames.toSet -- df.schema.fieldNames.toSet
    val extra = df.schema.fieldNames.toSet -- target.fieldNames.toSet
    if (missing.nonEmpty || extra.nonEmpty)
      throw new IllegalArgumentException(
        s"insert into $name: schema mismatch (missing=$missing, unexpected=$extra)")
    df.select(target.fieldNames.map(col): _*)
      .write.mode("append").json(dir(name))
  }

  /** DESCRIBE (P5): one row per column, like the reference transcript
    * (README.md:543-556).
    */
  def describe(name: String): DataFrame = {
    import spark.implicits._
    schemaOf(name).fields.map(f =>
      (f.name, f.dataType.simpleString, f.nullable)).toSeq
      .toDF("col_name", "data_type", "nullable")
  }

  def drop(name: String): Unit = {
    registry.remove(name)
    spark.catalog.dropTempView(name)
  }
}
