package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the most recent right row with
  * `rightTs <= leftTs` within the same key — the time-series join Spark
  * lacks as a built-in (SURVEY §2.3 lists it absent from both the
  * reference and Spark's join zoo).
  *
  * Implementation is the single-pass union-and-carry-forward form, NOT a
  * range-predicate join: tag both sides, union, sort by (key, ts, side),
  * and carry the latest right payload forward with
  * `last(..., ignoreNulls)` over an unbounded-preceding window. One
  * shuffle on the key, sort within partitions — the same cost class as
  * any windowed aggregation, with none of the quadratic blowup a
  * `BETWEEN`-style range join suffers on dense right sides. Skewed keys
  * are AQE's problem like any other window (salt the key upstream if one
  * user dominates).
  */
object AsofJoin {

  /** leftTs/rightTs columns must be mutually comparable (both timestamp
    * or both numeric). Right payload columns arrive null when no right
    * row precedes the left row (like ASOF LEFT JOIN).
    */
  def asofLeft(
      left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // side ordering: right (0) sorts before left (1) at equal ts, so a
    // right row AT the left row's timestamp is visible to it (ts <= ts)
    val l = left.withColumn("__side", lit(1))
      .withColumn("__ts", col(leftTs))
      .select((leftCols.map(col) ++ rightPayload.map(c => lit(null).cast(
        right.schema(c).dataType).as(s"__r_$c")) ++ Seq(col("__side"), col("__ts"))): _*)
    val r = right
      .select((Seq(col(key), col(rightTs).as("__ts"), lit(0).as("__side")) ++
        rightPayload.map(c => col(c).as(s"__r_$c"))): _*)
    // align schemas for union
    val rAligned = r.select((leftCols.map {
      case c if c == key => col(key)
      case c => lit(null).cast(left.schema(c).dataType).as(c)
    } ++ rightPayload.map(c => col(s"__r_$c")) ++ Seq(col("__side"), col("__ts"))): _*)
    val unioned = l.unionByName(rAligned)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightPayload.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__asof_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++ rightPayload.map(c => col(s"__asof_$c").as(c))): _*)
  }
}
