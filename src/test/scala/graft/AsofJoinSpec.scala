package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof left join picks the latest right row at-or-before the left ts") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 09:00:00")))
      .toDF("id", "key", "t")
    val right = Seq(
      (10L, ts("2024-01-01 09:30:00"), "a"),
      (10L, ts("2024-01-01 11:00:00"), "b"),
      (20L, ts("2024-01-01 09:30:00"), "c")) // after left row 3
      .toDF("key", "t", "tag")
    val got = AsofJoin.asofLeft(left, right, "key", "t", "t", Seq("tag"))
      .select("id", "tag").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(1L -> "a", 2L -> "b", 3L -> null))
  }

  test("right row exactly at the left timestamp is visible") {
    val left = Seq((1L, 5L, ts("2024-01-01 10:00:00"))).toDF("id", "key", "t")
    val right = Seq((5L, ts("2024-01-01 10:00:00"), "same")).toDF("key", "t", "tag")
    val got = AsofJoin.asofLeft(left, right, "key", "t", "t", Seq("tag")).head()
    assert(got.getString(got.fieldIndex("tag")) == "same")
  }

  test("strict boundary excludes the coincident right row in both directions") {
    val left = Seq(
      (1L, 5L, ts("2024-01-01 10:00:00")),
      (2L, 5L, ts("2024-01-01 12:00:00"))).toDF("id", "key", "t")
    val right = Seq(
      (5L, ts("2024-01-01 10:00:00"), "at10"),
      (5L, ts("2024-01-01 11:00:00"), "at11")).toDF("key", "t", "tag")
    def run(direction: String, strict: Boolean): Map[Long, String] =
      AsofJoin.asofLeft(left, right, "key", "t", "t", Seq("tag"),
        direction, strict)
        .select("id", "tag").collect()
        .map(r => (r.getLong(0), r.getString(1))).toMap
    // backward: left row 1 coincides with at10 — inclusive sees it,
    // strict falls back to (nothing); row 2 unaffected
    assert(run("backward", strict = false) == Map(1L -> "at10", 2L -> "at11"))
    assert(run("backward", strict = true) == Map(1L -> null, 2L -> "at11"))
    // forward: inclusive takes the coincident row, strict the next one
    assert(run("forward", strict = false) == Map(1L -> "at10", 2L -> null))
    assert(run("forward", strict = true) == Map(1L -> "at11", 2L -> null))
  }

  test("matches a windowed brute-force oracle on events data") {
    val ev = Tables(spark, sf, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("value"))
    val got = AsofJoin.asofLeft(purchases, signups, "user_id", "ts", "ts", Seq("value"))
      .select("event_id", "value").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toMap
    // brute force: join all preceding signups, keep max-ts one
    val brute = purchases.alias("p")
      .join(signups.alias("s"),
        col("p.user_id") === col("s.user_id") && col("p.ts") >= col("s.ts"), "left")
      .groupBy(col("p.event_id"))
      .agg(max(struct(col("s.ts"), col("s.value"))).as("m"))
      .select(col("event_id"), col("m.value"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(got == brute)
    assert(got.nonEmpty)
  }

  test("forward direction matches a brute-force oracle; coincident rows visible") {
    val ev = Tables(spark, sf, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("value"))
    val got = AsofJoin.asofLeft(purchases, signups, "user_id", "ts", "ts",
      Seq("value"), direction = "forward")
      .select("event_id", "value").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toMap
    // brute force: join all following signups, keep min-ts one
    val brute = purchases.alias("p")
      .join(signups.alias("s"),
        col("p.user_id") === col("s.user_id") && col("p.ts") <= col("s.ts"), "left")
      .groupBy(col("p.event_id"))
      .agg(min(struct(col("s.ts"), col("s.value"))).as("m"))
      .select(col("event_id"), col("m.value"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(got == brute)
    // exact-coincidence visibility in the forward direction
    val left = Seq((1L, 5L, ts("2024-01-01 10:00:00"))).toDF("id", "key", "t")
    val right = Seq((5L, ts("2024-01-01 10:00:00"), "same")).toDF("key", "t", "tag")
    val one = AsofJoin.asofLeft(left, right, "key", "t", "t", Seq("tag"),
      direction = "forward").head()
    assert(one.getString(one.fieldIndex("tag")) == "same")
  }

  test("nearest direction picks the closer side, ties to backward") {
    val left = Seq(
      (1L, 5L, ts("2024-01-01 10:00:00")),  // bw 09:00 (1h), fw 10:30 (30m) -> fw
      (2L, 5L, ts("2024-01-01 09:10:00")),  // bw 09:00 (10m), fw 10:30 (80m) -> bw
      (3L, 6L, ts("2024-01-01 10:00:00")),  // equidistant 1h both sides -> bw
      (4L, 7L, ts("2024-01-01 10:00:00")))  // only fw exists -> fw
      .toDF("id", "key", "t")
    val right = Seq(
      (5L, ts("2024-01-01 09:00:00"), "bw5"),
      (5L, ts("2024-01-01 10:30:00"), "fw5"),
      (6L, ts("2024-01-01 09:00:00"), "bw6"),
      (6L, ts("2024-01-01 11:00:00"), "fw6"),
      (7L, ts("2024-01-01 11:00:00"), "fw7"))
      .toDF("key", "t", "tag")
    val got = AsofJoin.asofLeft(left, right, "key", "t", "t", Seq("tag"),
      direction = "nearest")
      .select("id", "tag").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(1L -> "fw5", 2L -> "bw5", 3L -> "bw6", 4L -> "fw7"))
  }

  test("null timestamps match nothing on either side (SQL ASOF semantics)") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, null.asInstanceOf[Timestamp]), // null left ts -> no match
      (3L, 20L, ts("2024-01-01 09:00:00")))
      .toDF("id", "key", "t")
    val right = Seq(
      (10L, ts("2024-01-01 09:30:00"), "a"),
      (10L, null.asInstanceOf[Timestamp], "poison"), // must donate to no one
      (20L, null.asInstanceOf[Timestamp], "poison2"))
      .toDF("key", "t", "tag")
    for (dir <- Seq("backward", "forward", "nearest")) {
      val got = AsofJoin.asofLeft(left, right, "key", "t", "t", Seq("tag"),
        direction = dir)
        .select("id", "tag").collect().map(r => (r.getLong(0), r.getString(1))).toMap
      assert(got(2L) == null, s"$dir: null left ts must yield null payload")
      assert(got(3L) == null, s"$dir: null right ts must not donate a payload")
      if (dir != "forward")
        assert(got(1L) == "a", s"$dir: real match must survive the null filter")
    }
  }
}
