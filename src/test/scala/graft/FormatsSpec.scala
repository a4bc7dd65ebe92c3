package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** SURVEY §2.12: the reference only ever uses JSON-on-Kafka; the rebuild
  * supplies the full Spark datasource breadth. Round-trip each built-in
  * format over real testdata to claim the category.
  */
class FormatsSpec extends SparkSpec {

  private lazy val docs = Tables(spark, sf, "documents")
    .select("doc_id", "lang", "source", "n_chars")

  private def roundTrip(fmt: String): Unit = {
    val dir = Files.createTempDirectory(s"graft_fmt_$fmt").toString + "/out"
    docs.write.format(fmt).option("header", "true").save(dir)
    val back = spark.read.format(fmt)
      .option("header", "true").option("inferSchema", "true").load(dir)
    val a = docs.orderBy("doc_id").collect().map(_.toString).toSeq
    val b = back.select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(a == b, s"$fmt round-trip mismatch")
  }

  test("parquet round-trip")(roundTrip("parquet"))
  test("orc round-trip")(roundTrip("orc"))
  test("json round-trip")(roundTrip("json"))
  test("csv round-trip")(roundTrip("csv"))

  test("csv with explicit schema reads without inference") {
    val dir = Files.createTempDirectory("graft_csv2").toString + "/out"
    docs.write.option("header", "true").csv(dir)
    val back = spark.read.schema(docs.schema).option("header", "true").csv(dir)
    assert(back.count() == docs.count())
    assert(back.schema == docs.schema)
  }
}
