package graft.operators

import org.apache.spark.sql.SparkSession

/** Bounded LRU cache for trained serve-time models (PQ codebooks, SQ/BQ
  * quantizer bounds, classifier weights). Overflow evicts the LEAST
  * RECENTLY USED entry only — never the whole map: a long-lived session
  * cycling registration-scoped tags must not dump every other corpus's
  * hot model and force retrains (persisted entries reload from disk;
  * persist=false entries retrain — both at most once, and only for the
  * evicted key).
  */
private[operators] final class ModelCache[V](maxEntries: Int = 64) {
  private val m = new java.util.LinkedHashMap[String, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, V]): Boolean =
      size() > maxEntries
  }

  /** Atomic lookup-or-train; `f` runs at most once per key while cached. */
  def getOrElseUpdate(key: String)(f: => V): V = m.synchronized {
    val cur = m.get(key)
    if (cur != null) cur
    else { val v = f; m.put(key, v); v }
  }

  private[operators] def size: Int = m.synchronized(m.size())
  private[operators] def contains(key: String): Boolean =
    m.synchronized(m.containsKey(key))
}

/** Filesystem probes through the Hadoop FileSystem API, so persisted
  * index/model artifacts may live on ANY supported filesystem (HDFS,
  * S3A, local). `java.io.File` would silently report a remote artifact
  * as missing and retrain/rewrite on every JVM — wrong at 100 TB, where
  * the artifact store is never the local disk.
  */
private[graft] object FsUtil {
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Create an empty marker file (e.g. a build-complete flag written
    * LAST, so its existence implies the whole artifact landed).
    */
  def touch(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .create(p, true).close()
  }
}
