package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.IntervalJoin

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("pairs within the gap are found across bucket boundaries") {
    // bucket width = gap = 60s; rows 1&2 are 59s apart but straddle a
    // minute boundary — the adjacent-bucket probe must still pair them
    val left = Seq(
      (1L, 7L, ts("2024-01-01 10:00:59")),
      (3L, 7L, ts("2024-01-01 10:10:00")))
      .toDF("id", "k", "t")
    val right = Seq(
      (2L, 7L, ts("2024-01-01 10:01:58")),
      (4L, 7L, ts("2024-01-01 10:15:00")), // 5 min away: out of range
      (5L, 8L, ts("2024-01-01 10:00:59"))) // same ts, different key
      .toDF("id2", "k", "t2")
    val got = IntervalJoin.within(left, right, "k", "t", "t2", 60, Seq("id2"))
      .select("id", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }

  test("matches the brute-force range join on events data") {
    val ev = Tables(spark, sf, "events").select("event_id", "user_id", "ts")
    val got = IntervalJoin.within(
      ev, ev.withColumnRenamed("event_id", "eid2").withColumnRenamed("ts", "ts2"),
      "user_id", "ts", "ts2", 120, Seq("eid2"))
      .filter(col("event_id") < col("eid2"))
      .select("event_id", "eid2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = ev.alias("a"); val b = ev.alias("b")
    val brute = a.join(b,
      col("a.user_id") === col("b.user_id") &&
        col("a.event_id") < col("b.event_id") &&
        abs(unix_micros(col("a.ts")) - unix_micros(col("b.ts"))) <= 120000000L)
      .select(col("a.event_id"), col("b.event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute)
    assert(got.nonEmpty)
  }
}
