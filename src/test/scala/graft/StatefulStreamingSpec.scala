package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Streams

class StatefulStreamingSpec extends SparkSpec {

  test("mapGroupsWithState running totals converge to the batch aggregate") {
    val events = Tables(spark, sf, "events")
    val src = Files.createTempDirectory("graft_state_src").toString
    // two files -> with maxFilesPerTrigger=8 the source may still batch
    // them together; split by parity guarantees both halves exist
    events.filter(col("event_id") % 2 === 0).write.parquet(s"$src/f0")
    events.filter(col("event_id") % 2 === 1).write.parquet(s"$src/f1")

    val stream = Streams.runningUserTotals(
      spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$src/*"))
    val q = stream.writeStream
      .format("memory").queryName("user_totals").outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // update mode emits one row per user per batch; the LAST emission per
    // user is the running total = the batch aggregate over all events
    val finalRows = spark.table("user_totals")
      .groupBy("user_id").agg(max(struct(col("n_events"), col("total_value"))).as("last"))
      .select(col("user_id"), col("last.n_events"), col("last.total_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = events.groupBy(col("user_id").cast("long").as("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (sum(round(col("value") * 100)) / 100.0).as("total_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(finalRows == batch)
    assert(finalRows.nonEmpty)
  }
}
