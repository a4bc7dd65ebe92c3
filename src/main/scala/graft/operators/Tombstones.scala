package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deletion support for the at-rest vector index stores (IVF / IVF-PQ /
  * HNSW) — the right-to-be-forgotten path a training-data corpus needs:
  * removing a document's vectors from a 100 TB index cannot mean
  * rewriting the index, so deletes land as TOMBSTONE epochs and the
  * store heals physically at its next compaction (exactly how the
  * reference's ecosystem handles deletes: Kafka compacted topics write
  * null-value tombstones, Lucene/Atlas segment indexes mark live-docs
  * and purge on merge — see [[graft.sources.TopicCatalog]]'s tombstone
  * twin for keyed topics).
  *
  * Protocol (shared by every store family):
  *
  *  - `$root/tombstones/epoch=T/` holds the deleted ids, written under
  *    the store lock. A row DIES iff its segment epoch ≤ the id's
  *    newest tombstone epoch; a LATER re-ingest of the same id
  *    out-lives the tombstone — the same last-writer-wins order the
  *    epoch machinery already gives appends, extended to deletes.
  *  - Serve-time: the per-id max tombstone epoch joins against the
  *    candidate rows (the tombstone side is a deduplicated id set —
  *    deletes are small relative to the corpus, AQE broadcasts it; no
  *    forced-broadcast byte hazard).
  *  - Compaction: the same rule applies PHYSICALLY to closed segments,
  *    then fully-applied tombstone epochs are dropped (a partition-dir
  *    delete — metadata only). Tombstones at or above a stream's
  *    in-flight epoch are RETAINED: the in-flight segment's
  *    at-least-once replay may re-write rows the tombstone already
  *    killed, and only the surviving tombstone keeps them dead at
  *    serve time until the next compaction.
  */
object Tombstones {

  private def dir(root: String) = s"$root/tombstones"

  def exists(spark: SparkSession, root: String): Boolean =
    FsUtil.exists(spark, dir(root))

  /** Record `ids` as deleted at `epoch`. Caller holds the store lock
    * (the write is an append of a fresh epoch partition — idempotent
    * re-delete of the same ids at the same epoch is harmless but the
    * lock serializes it against compaction's swap).
    */
  def write(spark: SparkSession, root: String, ids: DataFrame,
      idCol: String, epoch: Long): Unit = {
    val slim = ids.select(col(idCol).cast("long").as("id")).distinct()
      .localCheckpoint()
    // an empty delete must be a NO-OP, not a schema trap: a zero-row
    // partitioned write leaves a tombstones dir with no data files, and
    // every later maxPerId read would die on schema inference
    if (!slim.isEmpty)
      slim.withColumn("epoch", lit(epoch))
        .write.partitionBy("epoch").mode("append").parquet(dir(root))
  }

  /** The per-id newest tombstone epoch — the one table every consumer
    * joins against: `(id, __tomb_epoch)`.
    */
  def maxPerId(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(dir(root))
      .groupBy(col("id"))
      .agg(max(col("epoch").cast("long")).as("__tomb_epoch"))

  /** Drop dead rows from `df`: survivors either carry an id with no
    * tombstone or out-live the id's newest tombstone
    * (`epochCol > __tomb_epoch`). No-op when the store has no
    * tombstones dir.
    */
  def filterLive(spark: SparkSession, root: String, df: DataFrame,
      idCol: String, epochCol: String): DataFrame =
    if (!exists(spark, root)) df
    else {
      // renamed join key: the consumer's frame usually has its own `id`
      val tomb = maxPerId(spark, root)
        .select(col("id").as("__tomb_id"), col("__tomb_epoch"))
      df.join(tomb, df(idCol) === tomb("__tomb_id"), "left")
        .filter(col("__tomb_epoch").isNull ||
          col(epochCol).cast("long") > col("__tomb_epoch"))
        .drop("__tomb_id", "__tomb_epoch")
    }

  /** After compaction physically applied the rule to all CLOSED
    * segments: drop fully-applied tombstone epochs, keep those that can
    * still affect the in-flight epoch's replays (epoch ≥
    * `excludeEpoch`). With no in-flight epoch the whole dir goes. Pure
    * partition-directory deletes — no data read.
    */
  def clearApplied(spark: SparkSession, root: String,
      excludeEpoch: Long = Long.MinValue): Unit = {
    if (!exists(spark, root)) return
    val p = new Path(dir(root))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (excludeEpoch == Long.MinValue) { fs.delete(p, true); return }
    fs.listStatus(p).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith("epoch=") &&
        n.stripPrefix("epoch=").toLong < excludeEpoch)
        fs.delete(st.getPath, true)
    }
    // nothing retained -> no tombstones dir (serve-time stays join-free)
    if (fs.listStatus(p).forall(s =>
      !(s.isDirectory && s.getPath.getName.startsWith("epoch="))))
      fs.delete(p, true)
  }

  /** Newest segment epoch present under a partitioned store dir (any
    * nesting — `cell=/epoch=` or `shard=/epoch=`), via directory
    * listing only. The default delete epoch: "delete what the store
    * holds NOW" — every current row dies, any future append out-lives
    * it.
    */
  def maxEpochIn(spark: SparkSession, storeDir: String): Long = {
    val p = new Path(storeDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(d: Path): Iterator[Long] =
      fs.listStatus(d).iterator.filter(_.isDirectory).flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("epoch=")) Iterator.single(n.stripPrefix("epoch=").toLong)
        else if (n.contains("=")) walk(st.getPath)
        else Iterator.empty
      }
    val es = walk(p)
    require(es.hasNext, s"no epoch partitions under '$storeDir' — not an " +
      "epoch-partitioned index store")
    es.max
  }
}
