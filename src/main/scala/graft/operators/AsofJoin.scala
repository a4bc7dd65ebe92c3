package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the nearest right row within
  * the same key — backward (`rightTs <= leftTs`, the default), forward
  * (`rightTs >= leftTs`), or nearest (whichever side is closer, ties to
  * backward) — the time-series join Spark lacks as a built-in (SURVEY
  * §2.3 lists it absent from both the reference and Spark's join zoo).
  *
  * Implementation is the single-pass union-and-carry form, NOT a
  * range-predicate join: tag both sides, union, sort by (key, ts, side),
  * and carry the latest right payload with `last(..., ignoreNulls)`
  * over an unbounded-preceding window (descending order for the forward
  * direction; both windows over the one union for nearest). One shuffle
  * on the key, sort within partitions — the same cost class as any
  * windowed aggregation, with none of the quadratic blowup a
  * `BETWEEN`-style range join suffers on dense right sides. Skewed keys
  * are AQE's problem like any other window (salt the key upstream if one
  * user dominates).
  */
object AsofJoin {

  /** leftTs/rightTs columns must be mutually comparable (both timestamp
    * or both numeric). Right payload columns arrive null when no right
    * row qualifies (like ASOF LEFT JOIN). A right row AT the left row's
    * exact timestamp qualifies in every direction by default;
    * `strict = true` excludes it (the `>` / `<` boundary of SQL ASOF
    * dialects, vs the default `>=` / `<=`).
    */
  def asofLeft(
      left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      rightPayload: Seq[String], direction: String = "backward",
      strict: Boolean = false): DataFrame = {
    require(Set("backward", "forward", "nearest").contains(direction),
      s"asofLeft: direction '$direction' not in backward/forward/nearest")
    val leftCols = left.columns.toSeq
    // the right row's own ts rides along as an extra payload: forward /
    // nearest need it to measure distance
    val payloads = rightPayload :+ "__rts"
    val l = left.withColumn("__side", lit(1))
      .withColumn("__ts", col(leftTs))
      .select((leftCols.map(col) ++ rightPayload.map(c => lit(null).cast(
        right.schema(c).dataType).as(s"__r_$c")) ++
        Seq(lit(null).cast(right.schema(rightTs).dataType).as("__r___rts"),
          col("__side"), col("__ts"))): _*)
    // a null-ts right row matches nothing (SQL ASOF semantics): unfiltered
    // it would sort first in the backward window and donate its payload to
    // left rows with no real predecessor
    val r = right
      .filter(col(rightTs).isNotNull)
      .select((Seq(col(key), col(rightTs).as("__ts"), lit(0).as("__side"),
        col(rightTs).as("__r___rts")) ++
        rightPayload.map(c => col(c).as(s"__r_$c"))): _*)
    // align schemas for union
    val rAligned = r.select((leftCols.map {
      case c if c == key => col(key)
      case c => lit(null).cast(left.schema(c).dataType).as(c)
    } ++ payloads.map(c => col(s"__r_$c")) ++ Seq(col("__side"), col("__ts"))): _*)
    val unioned = l.unionByName(rAligned)
    // side ordering decides the boundary: right (0) before left (1) at
    // equal ts makes an exactly-coincident right row visible (inclusive
    // >=/<=); strict flips it so the left row's window position hasn't
    // seen the coincident right row yet (exclusive >/<). Same flip in
    // BOTH window directions.
    val sideOrd = if (strict) col("__side").desc else col("__side").asc
    def carryAll(df: DataFrame, w: org.apache.spark.sql.expressions.WindowSpec,
        prefix: String): DataFrame =
      payloads.foldLeft(df) { (d, c) =>
        d.withColumn(s"$prefix$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
      }
    val wBack = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, sideOrd)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(col(key))
      .orderBy(col("__ts").desc, sideOrd)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = direction match {
      case "backward" => carryAll(unioned, wBack, "__bw_")
      case "forward"  => carryAll(unioned, wFwd, "__fw_")
      case _          => carryAll(carryAll(unioned, wBack, "__bw_"), wFwd, "__fw_")
    }
    // a null-ts LEFT row also matches nothing: the desc window would sort
    // it last and hand it the earliest right row
    val picked = rightPayload.map { c =>
      when(col("__ts").isNull, lit(null)).otherwise(direction match {
        case "backward" => col(s"__bw_$c")
        case "forward"  => col(s"__fw_$c")
        case _ =>
          // nearest: compare |leftTs - matchedTs| on both sides; ties
          // and missing-forward fall back to backward
          val bwDist = col("__ts").cast("double") - col("__bw___rts").cast("double")
          val fwDist = col("__fw___rts").cast("double") - col("__ts").cast("double")
          when(col("__bw___rts").isNull, col(s"__fw_$c"))
            .when(col("__fw___rts").isNull, col(s"__bw_$c"))
            .when(bwDist <= fwDist, col(s"__bw_$c"))
            .otherwise(col(s"__fw_$c"))
      }).as(c)
    }
    carried
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ picked: _*)
  }
}
