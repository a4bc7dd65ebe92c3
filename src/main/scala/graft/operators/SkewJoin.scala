package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffles — the manual fallback when AQE's
  * skew-join splitting isn't available (e.g. aggregations, or a skewed
  * key whose partition still exceeds executor memory after AQE splits).
  *
  * Aggregation form: groupBy(key) becomes a two-phase
  * groupBy(key, salt) -> groupBy(key) — the hot key's rows spread over
  * `buckets` reducers in phase one, and phase two only merges `buckets`
  * partial rows per key. Correct for any commutative re-aggregable
  * partial (sum/count/min/max here).
  *
  * Join form: the skewed (large) side gets a deterministic salt from its
  * row identity; the small side is replicated `buckets` times with every
  * salt value, then the equi-join runs on (key, salt). Replication
  * multiplies the small side by `buckets` — use only when the small side
  * is modest but too big or too skewed to broadcast outright.
  */
object SkewJoin {

  /** Two-phase salted sum aggregation. `aggs` maps output column name ->
    * column to sum (use lit(1) for a count). The salt derives from the
    * full row identity, so the hot key spreads evenly and
    * deterministically.
    */
  def saltedSumAgg(
      df: DataFrame, key: String, buckets: Int,
      aggs: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)), lit(buckets)))
    val partials = aggs.map { case (n, c) => sum(c).as(s"__p_$n") }
    val finals = aggs.map { case (n, _) => sum(col(s"__p_$n")).as(n) }
    salted.groupBy(col(key), col("__salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col(key))
      .agg(finals.head, finals.tail: _*)
  }

  /** Salted equi-join: big (skewed) side vs small side on `key`. */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String, buckets: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.toIndexedSeq.map(col): _*)), lit(buckets)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
