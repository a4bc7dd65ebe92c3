package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    def runOne(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame, dir: String): Boolean =
      // noop sink: forces full evaluation of every output column (count()
      // would let Catalyst prune the expensive expressions away and time
      // a different, cheaper plan).
      try { fn(spark, dir).write.format("noop").mode("overwrite").save(); true }
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); false }

    // Session-accumulation telemetry (stderr only, shape-stable detail
    // line): cumulative JVM GC millis, live driver heap, and the block
    // manager's persisted-RDD population. A board-wide per-query drift
    // with flat storage + flat GC deltas across passes is host-side
    // (microVM memory reclaim); growing storage/GC across passes is
    // session residue and points at the leak.
    def snap(label: String, gc0: Long): Long = {
      import scala.jdk.CollectionConverters._
      val gc = java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
      val mem = java.lang.management.ManagementFactory
        .getMemoryMXBean.getHeapMemoryUsage.getUsed
      val rdds = spark.sparkContext.getRDDStorageInfo: @annotation.nowarn("cat=deprecation")
      val views = spark.sessionState.catalog.getTempViewNames().size
      System.err.println(
        f"[bench] $label: gc_delta=${gc - gc0}%dms heap=${mem / (1 << 20)}%dMB " +
          f"persisted_rdds=${rdds.length}%d storage_mem=${rdds.map(_.memSize).sum / (1 << 20)}%dMB " +
          f"temp_views=$views%d")
      gc
    }
    var gcMark = snap("start", 0L)

    // Warmup at the smallest SF: JIT-compiles codegen'd stages, UDF hot
    // loops, and shuffle paths so the timed pass measures steady-state
    // throughput rather than first-run compilation.
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir)
      SparkEntry.queries.foreach { case (n, fn) => runOne(n, fn, warmDir) }
    gcMark = snap("warmup done", gcMark)
    // Three timed passes, per-query MIN reported: this host's microVM
    // can stall the whole guest for seconds under host memory reclaim
    // (observed 3-6x single-query outliers with identical plans, and
    // 1.1-1.7x uniform inflation across whole multi-minute windows), and
    // the per-query min over three samples measures steady-state plan
    // cost rather than host luck.
    // A failed query is reported as -1, never as a normal-looking (tiny)
    // timing that could silently pass as a fast result.
    def timedPass(i: Int): Map[String, Double] = {
      val r = SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = runOne(name, fn, sfDir)
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
      System.err.println(
        f"[bench] pass $i total=${r.values.filter(_ >= 0).sum}%.1fs")
      gcMark = snap(s"pass $i done", gcMark)
      r
    }
    val passes = Seq(timedPass(1), timedPass(2), timedPass(3))
    val results = SparkEntry.queries.keys.map { name =>
      val ts = passes.map(_(name))
      name -> (if (ts.exists(_ < 0)) -1.0 else ts.min)
    }.toSeq
    val failed = results.collect { case (k, v) if v < 0 => s"\"" + k + "\"" }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val passTotals = passes.map(_.values.filter(_ >= 0).sum)
      .map(t => f"$t%.3f").mkString("[", ",", "]")
    // detail line first, compact total LAST: the driver captures the tail
    // of the log, and the long per-query map was truncated in BENCH_r02 —
    // the last line must always carry the headline number.
    val detail = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":${failed.mkString("[", ",", "]")},"runs":3,"agg":"min","pass_totals":$passTotals,"sf":"$sfDir"}"""
    println(detail)
    // the driver's tail capture truncates the long per-query map
    // (BENCH_r06/r07 shipped "parsed": null), so ALSO write the full
    // detail line to a tracked file — round-over-round per-query deltas
    // stay complete regardless of log truncation. Path is cwd-relative
    // under sbt (the repo root); override with SPARK_GRAFT_BENCH_FULL
    // when launching from elsewhere (e.g. spark-submit).
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL", "BENCH_full.json")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(fullPath), detail + "\n")
    catch { case e: java.io.IOException =>
      System.err.println(s"[bench] could not write $fullPath: $e") }
    spark.stop()
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"n_failed":${failed.size},"runs":3,"agg":"min","sf":"$sfDir"}""")
  }
}
