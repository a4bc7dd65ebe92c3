package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.TopicCatalog

class SourcesSpec extends SparkSpec {

  private def catalog() =
    new TopicCatalog(spark, Files.createTempDirectory("graft_topics").toString)

  private val questionSchema = StructType(Seq(
    StructField("role", StringType), StructField("content", StringType),
    StructField("sessionid", StringType), StructField("email", StringType)))

  test("create + produce + schema-on-read scan (the reference's topic flow)") {
    val c = catalog()
    c.create("user_questions", questionSchema)
    // the reference's sample record (README.md:190 shape)
    c.produceJson("user_questions", Seq(
      """{"role":"user","content":"I am looking for shoes","sessionid":"s1","email":"a@b.c"}""",
      """{"role":"user","content":"blue shirt","sessionid":"s2"}"""))
    val rows = c.table("user_questions").orderBy("sessionid").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("content") == "I am looking for shoes")
    assert(rows(1).getAs[String]("email") == null) // absent field reads as null
  }

  test("strict-validation produce rejects undeclared fields (README.md:228-252)") {
    val c = catalog()
    c.create("q_strict", questionSchema, Map("validation" -> "strict"))
    // conforming records (with or without the implicit key) pass
    c.produceJson("q_strict", Seq(
      """{"role":"user","content":"hello","sessionid":"s1","email":"a@b.c"}""",
      """{"role":"user","content":"partial"}"""))
    assert(c.table("q_strict").count() == 2)
    // the Schema Registry additionalProperties=false error transcript:
    // a typo'd field fails the WHOLE produce atomically
    val err = intercept[IllegalArgumentException](c.produceJson("q_strict", Seq(
      """{"role":"user","content":"x","sesionid":"typo"}""")))
    assert(err.getMessage.contains("'sesionid'") &&
      err.getMessage.contains("additionalProperties=false"), err.getMessage)
    assert(c.table("q_strict").count() == 2, "rejected produce must not append")
    // nesting depth: undeclared field inside an ARRAY<ROW> element
    val nested = StructType(Seq(StructField("items", ArrayType(StructType(Seq(
      StructField("sku", StringType), StructField("qty", IntegerType)))))))
    c.create("orders_strict", nested, Map("validation" -> "strict"))
    c.produceJson("orders_strict", Seq("""{"items":[{"sku":"a","qty":1}]}"""))
    val err2 = intercept[IllegalArgumentException](c.produceJson("orders_strict",
      Seq("""{"items":[{"sku":"a","color":"red"}]}""")))
    assert(err2.getMessage.contains("'items.color'"), err2.getMessage)
    // nesting through a MAP: keys are free-form, but an undeclared field
    // inside a map-valued STRUCT is still rejected (it would silently
    // vanish on read — the exact failure strict mode exists to stop)
    val mapped = StructType(Seq(StructField("attrs",
      MapType(StringType, StructType(Seq(StructField("a", IntegerType)))))))
    c.create("attrs_strict", mapped, Map("validation" -> "strict"))
    c.produceJson("attrs_strict", Seq("""{"attrs":{"anyKey":{"a":1}}}"""))
    val errM = intercept[IllegalArgumentException](c.produceJson("attrs_strict",
      Seq("""{"attrs":{"k":{"a":1,"extra":2}}}""")))
    assert(errM.getMessage.contains("'attrs.k.extra'"), errM.getMessage)
    // malformed JSON fails at produce, not at first scan
    val err3 = intercept[IllegalArgumentException](
      c.produceJson("q_strict", Seq("""{"role": unquoted}""")))
    assert(err3.getMessage.contains("malformed JSON"), err3.getMessage)
    // default (no 'validation' config) keeps the raw-append evolution
    // posture: the same unknown field is preserved for later evolve
    val d = catalog()
    d.create("q_default", questionSchema)
    d.produceJson("q_default", Seq("""{"role":"user","content":"x","extra":"kept"}"""))
    assert(d.table("q_default").count() == 1)
    // config typo fails at CREATE
    val err4 = intercept[IllegalArgumentException](
      d.create("q_bad", questionSchema, Map("validation" -> "paranoid")))
    assert(err4.getMessage.contains("validation"), err4.getMessage)
  }

  test("insertInto enforces the registered schema at submit time") {
    val c = catalog()
    c.create("user_questions", questionSchema)
    import spark.implicits._
    val bad = Seq(("user", "hello")).toDF("role", "content")
    val err = intercept[IllegalArgumentException](c.insertInto("user_questions", bad))
    assert(err.getMessage.contains("schema mismatch"))
  }

  test("insert-select pipeline between topics (the perpetual INSERT, batch form)") {
    val c = catalog()
    c.create("user_questions", questionSchema)
    c.create("user_questions_vector", StructType(Seq(
      StructField("role", StringType), StructField("content", StringType),
      StructField("sessionid", StringType),
      StructField("vector", ArrayType(FloatType)))))
    c.produceJson("user_questions", Seq(
      """{"role":"user","content":"find shoes","sessionid":"s1","email":"x@y.z"}"""))
    // embed stage: note email is deliberately NOT carried (README.md:244-246)
    val embedded = c.table("user_questions")
      .select(col("role"), col("content"), col("sessionid"),
        graft.functions.HashEmbedder.embedCol(col("content")).as("vector"))
    c.insertInto("user_questions_vector", embedded)
    val out = c.table("user_questions_vector").collect()
    assert(out.length == 1)
    assert(out(0).getSeq[Float](out(0).fieldIndex("vector")).length == 64)
  }

  test("insertValues with complex ARRAY<ROW> literal (README.md:616-623)") {
    val c = catalog()
    val sch = StructType(Seq(
      StructField("sessionid", StringType),
      StructField("products", ArrayType(StructType(Seq(StructField("content", StringType)))))))
    c.create("llm_prompt_test", sch)
    c.insertValues("llm_prompt_test",
      Row("s1", Seq(Row("productA"), Row("productB"))))
    val got = c.table("llm_prompt_test").collect()(0)
    assert(got.getSeq[Row](got.fieldIndex("products")).map(_.getString(0)) == Seq("productA", "productB"))
  }

  test("full reference architecture: 4 topics, question to llm_answers") {
    import graft.model.Models
    import graft.operators.VectorSearch
    val c = catalog()
    // the reference's four tables (SURVEY §1.3)
    c.create("user_questions", questionSchema)
    c.create("user_questions_vector", StructType(Seq(
      StructField("role", StringType), StructField("content", StringType),
      StructField("sessionid", StringType), StructField("vector", ArrayType(FloatType)))))
    c.create("user_prompts", StructType(Seq(
      StructField("role", StringType), StructField("content", StringType),
      StructField("sessionid", StringType),
      StructField("products", ArrayType(StructType(Seq(StructField("content", StringType))))))))
    c.create("llm_answers", StructType(Seq(
      StructField("role", StringType), StructField("content", StringType),
      StructField("sessionid", StringType), StructField("json_response", StringType))))

    c.produceJson("user_questions", Seq(
      """{"role":"user","content":"Find me a pair of mens formal shoes in medium size.","sessionid":"abc123","email":"bob@example.com"}"""))
    val registry = Models.default()

    // stage 1: embed (the reference's first perpetual INSERT)
    c.insertInto("user_questions_vector", c.table("user_questions")
      .select(col("role"), col("content"), col("sessionid"),
        registry.mlPredict(Models.VectorEncoding, col("content")).as("vector")))

    // stage 2: vector search -> products
    val corpus = Tables(spark, sf, "embeddings")
      .withColumn("content", concat(lit("product_"), col("vec_id")))
    val retrieved = VectorSearch.searchResults(
      c.table("user_questions_vector"), "sessionid", "vector",
      corpus, "vec_id", "embedding", payload = Seq("content"), k = 3)
    c.insertInto("user_prompts", retrieved
      .select(col("role"), col("content"), col("sessionid"),
        col("search_results").as("products")))

    // stage 3: prompt assembly + LLM
    c.insertInto("llm_answers", c.table("user_prompts")
      .select(col("role"), col("content"), col("sessionid"),
        registry.mlPredict(Models.RetailAssistant,
          to_json(struct(col("role"), col("content"),
            to_json(col("products")).as("products")))).as("json_response")))

    val out = c.table("llm_answers").collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("sessionid") == "abc123")
    assert(out(0).getAs[String]("json_response").contains("assistant"))
  }

  test("compact consolidates small files without changing the data") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_compact").toString
    val c = new TopicCatalog(spark, root)
    c.create("busy_topic", questionSchema)
    // 5 produces + 1 insert = at least 6 files on disk
    (1 to 5).foreach(i => c.produceJson("busy_topic",
      Seq(s"""{"role":"user","content":"q$i","sessionid":"s$i"}""")))
    c.insertInto("busy_topic",
      Seq(("user", "bulk", "s9", "x@y.z")).toDF("role", "content", "sessionid", "email"))
    def snapshot() = c.table("busy_topic")
      .select("role", "content", "sessionid", "email")
      .collect().map(_.toSeq).toSet
    def nFiles() = new java.io.File(s"$root/busy_topic")
      .listFiles().count(_.getName.endsWith(".json"))
    val before = snapshot()
    assert(nFiles() >= 6)
    val removed = c.compact("busy_topic")
    assert(removed >= 6)
    assert(nFiles() == 1)
    assert(snapshot() == before)
    // the topic stays appendable and re-compactable
    c.produceJson("busy_topic", Seq("""{"role":"user","content":"late","sessionid":"s10"}"""))
    assert(snapshot().size == before.size + 1)
    assert(c.compact("busy_topic") == 2)
  }

  test("describe lists columns like the reference transcript, key BUCKET KEY first") {
    val c = catalog()
    c.create("user_questions", questionSchema)
    val d = c.describe("user_questions").collect()
    assert(d.map(_.getString(0)).toSeq == Seq("key", "role", "content", "sessionid", "email"))
    assert(d.head.getString(1) == "binary")
    assert(d.head.getAs[String]("extras") == "BUCKET KEY")
    assert(d.tail.forall(_.getString(1) == "string"))
    assert(d.tail.forall(_.getAs[String]("extras") == ""))
  }

  test("temp view makes the topic SQL-visible") {
    val c = catalog()
    c.create("user_questions", questionSchema)
    c.produceJson("user_questions", Seq("""{"role":"user","content":"q","sessionid":"s"}"""))
    // produce refreshes the view: no manual re-registration needed
    assert(spark.sql("SELECT count(*) FROM user_questions").head().getLong(0) == 1)
  }

  test("every topic table carries the implicit key BYTES bucket-key column (README.md:551)") {
    val c = catalog()
    c.create("user_questions", questionSchema)
    val sch = c.table("user_questions").schema
    assert(sch.fields.head.name == "key")
    assert(sch.fields.head.dataType == BinaryType)
    c.produceJson("user_questions", Seq("""{"role":"user","content":"q","sessionid":"s"}"""))
    assert(c.table("user_questions").head().getAs[Array[Byte]]("key") == null)
    // a declared 'key' column collides with the implicit one
    val err = intercept[IllegalArgumentException](
      c.create("bad_key", StructType(Seq(StructField("key", BinaryType)))))
    assert(err.getMessage.contains("implicit"))
  }

  test("degenerate ROW<> is rejected at CREATE time (README.md:586-608)") {
    val c = catalog()
    val err = intercept[IllegalArgumentException](
      c.create("llm_prompt_test", StructType(Seq(
        StructField("sessionid", StringType),
        StructField("llm_request_json_object", StructType(Seq.empty))))))
    assert(err.getMessage.contains("ROW<>"))
    // nested inside an array element too
    val err2 = intercept[IllegalArgumentException](
      c.create("llm_prompt_test2", StructType(Seq(
        StructField("products", ArrayType(StructType(Seq.empty)))))))
    assert(err2.getMessage.contains("ROW<>"))
  }

  test("schema evolution updates the table automatically (README.md:610-612)") {
    val c = catalog()
    c.create("user_questions", StructType(Seq(
      StructField("role", StringType), StructField("content", StringType))))
    c.produceJson("user_questions", Seq("""{"role":"user","content":"old record"}"""))
    // registry evolves: a sessionid field is appended
    c.evolve("user_questions", StructType(Seq(
      StructField("role", StringType), StructField("content", StringType),
      StructField("sessionid", StringType))))
    // pre-evolution records read the new field as null; the SQL view
    // followed the evolution without re-registration
    val old = spark.sql(
      "SELECT sessionid FROM user_questions WHERE content = 'old record'").collect()
    assert(old.length == 1 && old(0).getString(0) == null)
    c.produceJson("user_questions",
      Seq("""{"role":"user","content":"new record","sessionid":"s9"}"""))
    assert(c.table("user_questions").where(col("sessionid") === "s9").count() == 1)
    // incompatible evolutions fail: dropped field / changed type
    val errDrop = intercept[IllegalArgumentException](
      c.evolve("user_questions", StructType(Seq(StructField("role", StringType)))))
    assert(errDrop.getMessage.contains("drops field"))
    val errType = intercept[IllegalArgumentException](
      c.evolve("user_questions", StructType(Seq(
        StructField("role", IntegerType), StructField("content", StringType),
        StructField("sessionid", StringType)))))
    assert(errType.getMessage.contains("incompatible type change"))
  }

  test("keyed compaction keeps the latest record per key and applies tombstones") {
    val c = catalog()
    c.create("profiles", StructType(Seq(
      StructField("name", StringType), StructField("version", LongType))))
    def rec(key: String, name: String, version: Long) =
      spark.createDataFrame(
        java.util.Arrays.asList(Row(key.getBytes("UTF-8"), name, version)),
        StructType(TopicCatalog.KeyField +: c.valueSchemaOf("profiles").fields))
    c.insertInto("profiles", rec("u1", "alice", 1L))
    c.insertInto("profiles", rec("u1", "alicia", 2L))
    c.insertInto("profiles", rec("u2", "bob", 1L))
    c.insertInto("profiles", rec("u3", "carol", 5L))
    // CDC delete for u3, ordered after its latest record
    c.tombstone("profiles", "u3".getBytes("UTF-8"), Map("version" -> 6L))
    // before compaction the tombstone is an ordinary mostly-null record
    assert(c.table("profiles").count() == 5)
    val removed = c.compactKeyed("profiles", "version")
    assert(removed == 5) // five single-record files rewritten
    val after = c.table("profiles")
      .select(col("key").cast("string"), col("name"), col("version"))
      .orderBy("key").collect()
    assert(after.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq(("u1", "alicia", 2L), ("u2", "bob", 1L)))
    // idempotent: a second compaction converges without data change
    c.compactKeyed("profiles", "version")
    assert(c.table("profiles").count() == 2)
  }

  test("keyed compaction rejects unkeyed records (Kafka compacted-topic rule)") {
    val c = catalog()
    c.create("profiles", StructType(Seq(
      StructField("name", StringType), StructField("version", LongType))))
    c.insertValues("profiles", Row("alice", 1L)) // no key -> key reads null
    val err = intercept[IllegalStateException](c.compactKeyed("profiles", "version"))
    assert(err.getMessage.contains("unkeyed record"))
  }

  test("compaction recovery: rollback without MANIFEST, roll-forward with it") {
    val root = Files.createTempDirectory("graft_recover").toString
    val c = new TopicCatalog(spark, root)
    c.create("t", StructType(Seq(
      StructField("name", StringType), StructField("version", LongType))))
    c.produceJson("t", Seq("""{"name":"a","version":1}"""))
    c.produceJson("t", Seq("""{"name":"b","version":2}"""))
    import scala.jdk.CollectionConverters._
    val topicDir = java.nio.file.Paths.get(s"$root/t")
    val firstOriginal = {
      val s = Files.list(topicDir)
      try s.iterator().asScala.filter(_.getFileName.toString.endsWith(".json"))
        .toVector.sortBy(_.getFileName.toString).head
      finally s.close()
    }
    // crash BEFORE the manifest: staged parts must be discarded, their
    // records never surface
    val rollback = Files.createDirectory(topicDir.resolve(".compact-rollback"))
    Files.write(rollback.resolve("part-00000.json"),
      """{"name":"ghost","version":99}""".getBytes("UTF-8"))
    // crash AFTER the manifest, before the move: parts must roll FORWARD
    // (become visible) and the manifested original must be deleted
    val fwd = Files.createDirectory(topicDir.resolve(".compact-forward"))
    Files.write(fwd.resolve("part-00000.json"),
      """{"name":"recovered","version":9}""".getBytes("UTF-8"))
    Files.write(fwd.resolve("MANIFEST"),
      firstOriginal.getFileName.toString.getBytes("UTF-8"))
    c.compact("t")
    val after = c.table("t").select("name").collect().map(_.getString(0)).toSet
    assert(!after.contains("ghost"), "uncommitted staging leaked records")
    assert(after.contains("recovered"), "committed staging was not rolled forward")
    assert(!after.contains("a"), "the manifested original must be superseded")
    assert(after.contains("b"))
    // staging dirs are gone; re-run converges without change
    val leftovers = {
      val s = Files.list(topicDir)
      try s.iterator().asScala.filter(p => Files.isDirectory(p)).toVector
      finally s.close()
    }
    assert(leftovers.isEmpty)
    c.compact("t")
    assert(c.table("t").select("name").collect().map(_.getString(0)).toSet == after)
  }

  test("compactions serialize: concurrent compacts never duplicate records") {
    val root = Files.createTempDirectory("graft_serial").toString
    val c = new TopicCatalog(spark, root)
    c.create("t", StructType(Seq(
      StructField("name", StringType), StructField("version", LongType))))
    (1 to 20).foreach(i => c.produceJson("t", Seq(s"""{"name":"r$i","version":$i}""")))
    // two racing compactors in one JVM: the per-topic-dir monitor
    // serializes them — without it, each would roll back the other's
    // live staging and/or double-commit the same originals, baking
    // every record in twice
    import scala.jdk.CollectionConverters._
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (1 to 2).map { _ =>
      new Thread(() =>
        try c.compact("t")
        catch { case e: Throwable => errs.add(e) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"serialized compactions must both succeed: ${errs.asScala.headOption}")
    val rows = c.table("t").select("name").collect().map(_.getString(0)).toSeq
    assert(rows.sorted == (1 to 20).map(i => s"r$i").sorted,
      "concurrent compaction lost or duplicated records")
  }

  test("cross-process compaction lock: fresh lock fails fast, stale lock is taken over") {
    val root = Files.createTempDirectory("graft_lock").toString
    val c = new TopicCatalog(spark, root)
    c.create("t", StructType(Seq(StructField("name", StringType))))
    c.produceJson("t", Seq("""{"name":"a"}""", """{"name":"b"}"""))
    val lock = java.nio.file.Paths.get(s"$root/t/.compact.lock")
    // another process's LIVE lock (fresh mtime): compact refuses
    Files.write(lock, "99999\n".getBytes("UTF-8"))
    val e = intercept[IllegalStateException](c.compact("t"))
    assert(e.getMessage.contains("already in progress"))
    // a CRASHED process's lock (stale mtime): compact takes over
    Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 11 * 60 * 1000L))
    assert(c.compact("t") > 0)
    assert(!Files.exists(lock), "lock must be released after compaction")
    assert(c.table("t").count() == 2)
  }

  test("partitioned topic: records land in ingest_dt dirs; date slice prunes at listing time") {
    val root = Files.createTempDirectory("graft_part").toString
    val c = new TopicCatalog(spark, root)
    c.create("t", StructType(Seq(
      StructField("id", LongType), StructField("at", TimestampType))),
      Map("partition.by" -> "at"))
    def row(id: Long, d: String) = s"""{"id":$id,"at":"$d 10:00:00"}"""
    c.produceJson("t", Seq(row(1, "2024-01-01"), row(2, "2024-01-02"), row(3, "2024-01-03")))
    // layout: one ingest_dt=<date> dir per distinct date
    import scala.jdk.CollectionConverters._
    def dirs() = {
      val s = Files.list(java.nio.file.Paths.get(s"$root/t"))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("ingest_dt=")).toVector.sorted
      finally s.close()
    }
    assert(dirs() == Vector("ingest_dt=2024-01-01", "ingest_dt=2024-01-02",
      "ingest_dt=2024-01-03"))
    // the full scan sees every record with its payload intact
    assert(c.table("t").select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L))
    // the date-bounded slice READS only the matching partitions' files
    val slice = c.tableSlice("t", "2024-01-02", "2024-01-03")
    assert(slice.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    val scanned = slice.inputFiles.toSeq
    assert(scanned.nonEmpty && scanned.forall(f =>
      f.contains("ingest_dt=2024-01-02") || f.contains("ingest_dt=2024-01-03")),
      s"slice must not stat other partitions: $scanned")
    // partition-level retention deletes whole dirs without reading
    assert(c.expirePartitions("t", "2024-01-02") == 1)
    assert(dirs() == Vector("ingest_dt=2024-01-02", "ingest_dt=2024-01-03"))
    assert(c.table("t").count() == 2)
    // the schema may not claim the reserved derived column
    intercept[IllegalArgumentException] {
      c.create("bad", StructType(Seq(
        StructField("ingest_dt", StringType), StructField("at", TimestampType))),
        Map("partition.by" -> "at"))
    }
    // partition.by must name a time-typed schema column
    intercept[IllegalArgumentException] {
      c.create("bad2", StructType(Seq(StructField("id", LongType))),
        Map("partition.by" -> "id"))
    }
  }

  test("partitioned produce keeps raw bytes: unknown fields survive schema evolution") {
    val root = Files.createTempDirectory("graft_part_raw").toString
    val c = new TopicCatalog(spark, root)
    c.create("t", StructType(Seq(
      StructField("id", LongType), StructField("at", TimestampType))),
      Map("partition.by" -> "at"))
    // the record carries a field the schema doesn't know yet — it must
    // reach disk anyway (identical to unpartitioned schema-on-read), in
    // the ingest_dt= dir its partition column names
    c.produceJson("t", Seq(
      """{"id":1,"at":"2024-01-01 10:00:00","extra":"kept"}""",
      """{"id":2,"at":"2024-01-02 10:00:00","extra":"kept2"}""",
      """{"id":3,"at":null}"""))
    import scala.jdk.CollectionConverters._
    def ls(p: String) = {
      val s = Files.list(java.nio.file.Paths.get(p))
      try s.iterator().asScala.map(_.getFileName.toString).toVector.sorted
      finally s.close()
    }
    assert(ls(s"$root/t").count(_.startsWith("ingest_dt=")) == 2)
    // a null partition column lands as a loose root file, still readable
    assert(ls(s"$root/t").exists(f => f.startsWith("produce-") && f.endsWith(".json")))
    assert(c.table("t").count() == 3)
    assert(c.table("t").where(col("at").isNull).count() == 1)
    // evolve: the unknown field becomes schema — pre-evolution raw
    // records surface it (the typed-insert route would have dropped it)
    c.evolve("t", StructType(Seq(
      StructField("id", LongType), StructField("at", TimestampType),
      StructField("extra", StringType))))
    assert(c.table("t").where(col("extra") === "kept").count() == 1)
    assert(c.table("t").select("extra").collect().map(_.getString(0)).toSet ==
      Set("kept", "kept2", null))
    // the date slice still prunes: only the matching dir's file is read
    val slice = c.tableSlice("t", "2024-01-02", "2024-01-02")
    assert(slice.select("id").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("compaction preserves the partition layout (keyed and plain)") {
    val root = Files.createTempDirectory("graft_part_compact").toString
    val c = new TopicCatalog(spark, root)
    c.create("t", StructType(Seq(
      StructField("name", StringType), StructField("version", LongType),
      StructField("at", TimestampType))),
      Map("partition.by" -> "at"))
    def rec(name: String, v: Long, d: String) =
      s"""{"key":"${java.util.Base64.getEncoder.encodeToString(name.getBytes)}","name":"$name","version":$v,"at":"$d 10:00:00"}"""
    // key a: versions on two dates (latest on 01-02); key b: one version
    c.produceJson("t", Seq(rec("a", 1, "2024-01-01")))
    c.produceJson("t", Seq(rec("a", 2, "2024-01-02")))
    c.produceJson("t", Seq(rec("b", 1, "2024-01-01")))
    assert(c.compactKeyed("t", "version") > 0)
    val rows = c.table("t").select("name", "version").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows == Set(("a", 2L), ("b", 1L)))
    // winners still live under their ingest_dt dirs (pruning preserved)
    val files = c.table("t").inputFiles.toSeq
    assert(files.nonEmpty && files.forall(_.contains("ingest_dt=")),
      s"compacted files must keep the partition layout: $files")
    val slice = c.tableSlice("t", "2024-01-02", "2024-01-02")
    assert(slice.select("name").collect().map(_.getString(0)).toSeq == Seq("a"))
    assert(slice.inputFiles.forall(_.contains("ingest_dt=2024-01-02")))
    // plain small-file compaction on a partitioned topic also keeps dirs
    val c2root = Files.createTempDirectory("graft_part_compact2").toString
    val c2 = new TopicCatalog(spark, c2root)
    c2.create("u", StructType(Seq(
      StructField("id", LongType), StructField("at", TimestampType))),
      Map("partition.by" -> "at"))
    (1 to 6).foreach(i => c2.produceJson("u",
      Seq(s"""{"id":$i,"at":"2024-01-0${(i % 2) + 1} 10:00:00"}""")))
    assert(c2.compact("u") > 0)
    assert(c2.table("u").count() == 6)
    assert(c2.table("u").inputFiles.forall(_.contains("ingest_dt=")))
  }

  test("retention.ms on a partitioned topic drops expired partitions via COMPACT") {
    val root = Files.createTempDirectory("graft_retention").toString
    val c = new TopicCatalog(spark, root)
    // retain ~2 days: the 2020 partition must go, today's must stay
    c.create("t", StructType(Seq(
      StructField("id", LongType), StructField("at", TimestampType))),
      Map("partition.by" -> "at", "retention.ms" -> (2L * 86400000L).toString))
    val today = java.time.LocalDate.now(java.time.ZoneOffset.UTC).toString
    c.produceJson("t", Seq(
      """{"id":1,"at":"2020-01-01T10:00:00"}""",
      s"""{"id":2,"at":"${today}T00:10:00"}"""))
    assert(c.table("t").count() == 2)
    assert(c.compactByPolicy("t") >= 1)
    val left = c.table("t").select("id").collect().map(_.getLong(0)).toSeq
    assert(left == Seq(2L), s"expected only today's record, got $left")
    // no partition column -> retention is a no-op (never record-rewrites)
    val c2 = new TopicCatalog(spark, Files.createTempDirectory("graft_ret2").toString)
    c2.create("u", StructType(Seq(
      StructField("id", LongType), StructField("at", TimestampType))),
      Map("retention.ms" -> "1"))
    c2.produceJson("u", Seq("""{"id":1,"at":"2020-01-01T10:00:00"}"""))
    c2.compactByPolicy("u")
    assert(c2.table("u").count() == 1)
  }

  test("timestamps survive the topic JSON encoding at microsecond precision") {
    val c = catalog()
    c.create("stamped", StructType(Seq(
      StructField("id", LongType), StructField("at", TimestampType))))
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 10:20:30.123456")
    c.insertInto("stamped", spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, t0)),
      c.valueSchemaOf("stamped")))
    val got = c.table("stamped").select("at").head().getTimestamp(0)
    assert(got == t0)
  }
}
