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

  test("latestByKeyStream snapshot converges to the batch latestByKey") {
    val events = Tables(spark, sf, "events")
    val changelog = events.select(
      col("user_id").cast("long").as("k"),
      // fold the unique tiebreak into the ordering so stream fold order
      // and batch max_by agree on ties: (epoch-millis << 20) | event_id
      // (fits a long: ~2^41 millis * 2^20 < 2^63; event_id < 2^20 here)
      (unix_millis(col("ts")) * 1048576 + col("event_id")).as("ord"),
      col("event_type").as("payload"))
    val src = Files.createTempDirectory("graft_ktable_src").toString
    changelog.filter(col("k") % 2 === 0).write.parquet(s"$src/f0")
    changelog.filter(col("k") % 2 === 1).write.parquet(s"$src/f1")

    val stream = Streams.latestByKeyStream(
      spark.readStream.schema(changelog.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$src/*"))
    val q = stream.writeStream
      .format("memory").queryName("ktable").outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // the last emission per key is the maintained snapshot
    val got = spark.table("ktable")
      .groupBy("k").agg(max(struct(col("ord"), col("payload"))).as("w"))
      .select(col("k"), col("w.ord"), col("w.payload"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val want = graft.operators.Compaction
      .latestByKey(changelog, Seq("k"), Seq("ord"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }
}
