package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changelog → snapshot materialization: the batch equivalent of Kafka
  * log compaction ("retain the latest record per key"). The reference's
  * topics are plain retention-bounded Kafka topics (README.md:102 —
  * 1-hour retention); the compacted flavor is the other standard Kafka
  * cleanup policy, and a topic-backed table engine needs it to express
  * keyed state (latest user profile, latest product price) without
  * replaying the whole log on every scan.
  *
  * Scale shape: ONE shuffle on the key with partial (map-side)
  * aggregation — `max_by(struct(values), struct(ordering))`. The struct
  * buffer makes the aggregate sort-based locally (SortAggregate), but
  * the decisive property holds: `partial_max_by` collapses each
  * mapper's duplicates to a single candidate per key BELOW the
  * exchange, so shuffle volume scales with distinct keys, not changelog
  * length. A `row_number()` window would shuffle and sort the entire
  * changelog — at 100 TB with hot keys, that is the difference between
  * shipping the snapshot and shipping the history.
  */
object Compaction {

  /** Latest row per key: for each distinct value of `keyCols`, the row
    * with the lexicographically greatest `orderCols` tuple (nulls sort
    * lowest, Spark struct ordering both engines share). Column order of
    * the input is preserved. `orderCols` must totally order rows within
    * a key (include a unique tiebreak) for a deterministic result.
    */
  def latestByKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "latestByKey: at least one key column")
    require(orderCols.nonEmpty, "latestByKey: at least one ordering column")
    val valueCols = df.columns.filterNot(keyCols.contains).toSeq
    require(valueCols.nonEmpty, "latestByKey: keys cover every column")
    val winner = df
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(valueCols.map(col): _*),
        struct(orderCols.map(col): _*)).as("__winner"))
    winner.select(df.columns.toSeq.map { c =>
      if (keyCols.contains(c)) col(c) else col(s"__winner.`$c`")
    }: _*)
  }
}
