package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet test tables (TESTDATA.md).
  *
  * At 100 TB these would be partitioned/bucketed catalog tables; the API
  * is a plain parquet read so Catalyst column pruning and filter pushdown
  * reach the scan unimpeded.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS), which Spark reads as a raw
    // nanos Long only under spark.sql.legacy.parquet.nanosAsLong (set by
    // GraftSession); convert to µs TimestampType at the scan edge so every
    // operator downstream sees a plain timestamp.
    if (name == "events" && df.schema.fields.exists(f => f.name == "ts" && f.dataType == LongType))
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000"))) // integer div: ns are > 2^53, double math would lose µs
    else df
  }

  /** Register every table as a temp view (for the SQL surface). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
