package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: pairs of rows within a time distance of each
  * other per key — the batch form of a stream-stream interval join, and
  * another join shape absent from both the reference and Spark's
  * built-ins (SURVEY §2.3).
  *
  * A naive `a.ts BETWEEN b.ts - d AND b.ts + d` predicate degenerates to
  * a per-key cross product (broadcast nested loop). This implementation
  * buckets time into `width = maxGap` cells and equi-joins on
  * (key, bucket) with each left row probing its own and both adjacent
  * buckets — any in-range pair shares or neighbours a bucket, so the
  * equi-join is exact after the final range filter. Work scales with
  * rows-per-bucket density, not |A|x|B| per key, and the join is an
  * ordinary shuffle/broadcast hash join Catalyst can plan and AQE can
  * skew-split.
  */
object IntervalJoin {

  /** Pairs (left, right) with `|leftTs - rightTs| <= maxGapSeconds` and
    * equal join key. Output: left columns + the requested right payload
    * columns (prefixed on collision). Inner-join semantics.
    */
  def within(
      left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      maxGapSeconds: Long, rightPayload: Seq[String]): DataFrame = {
    val gapUs = maxGapSeconds * 1000000L
    val bucketL = (unix_micros(col(leftTs)) / gapUs).cast("long")
    val bucketR = (unix_micros(col(rightTs)) / gapUs).cast("long")
    val probes = left
      .withColumn("__b0", bucketL)
      .withColumn("__bucket", explode(array(col("__b0") - 1, col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    val payload = rightPayload.map(c => col(c).as(s"__r_$c"))
    val r = right.select((Seq(col(key).as("__rkey"), col(rightTs).as("__rts"),
      bucketR.as("__bucket")) ++ payload): _*)
    probes
      .join(r, probes(key) === r("__rkey") && probes("__bucket") === r("__bucket"))
      .filter(abs(unix_micros(col(leftTs)) - unix_micros(col("__rts"))) <= gapUs)
      .drop("__bucket", "__rkey", "__rts")
      .withColumnsRenamed(rightPayload.map(c => s"__r_$c" -> c).toMap)
  }
}
