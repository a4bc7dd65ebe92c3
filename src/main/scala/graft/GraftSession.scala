package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's required configs in one place, so
  * Verify, Bench, tests, and user code agree.
  */
object GraftSession {
  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // TypedImperativeAggregate (TopKByScore) runs in ObjectHashAggregate,
      // which falls back to sort-based aggregation after this many distinct
      // keys per task (default 128!) — with thousands of query groups that
      // would sort-spill the whole scored cross product. Buffers are tiny
      // (k ids+scores), so a large in-memory map is the right trade.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      // testdata events.ts is parquet TIMESTAMP(NANOS); Spark has no ns
      // timestamp — read as Long, converted at the scan edge (Tables).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession = {
    val s = builder(s"local[$cpus]", cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
