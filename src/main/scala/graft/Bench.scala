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

    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    }
    // Session-accumulation telemetry (stderr only, shape-stable detail
    // line): cumulative JVM GC millis, live driver heap, and the block
    // manager's persisted-RDD population. A board-wide per-query drift
    // with flat storage + flat GC deltas across passes is host-side
    // (microVM memory reclaim); growing storage/GC across passes is
    // session residue and points at the leak.
    def snap(label: String, gc0: Long): Long = {
      val gc = gcMillis
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
    // the start line is a BASELINE (gc0 seeded with the cumulative GC
    // time so far), not a delta from 0 — an absolute-since-JVM-start
    // number labeled gc_delta skewed exactly the drift read this line
    // exists for
    var gcMark = snap("start", gcMillis)

    // Host-side window telemetry: the committed artifact must be able to
    // defend itself against host-window inflation (r14/r15 both spent a
    // round re-litigating 1.1-1.7x uniform drift that was microVM memory
    // reclaim, not code). Three signals per pass, all cheap reads:
    //  - steal_pct: CPU-steal share of total jiffies over the pass
    //    (/proc/stat field 8) — hypervisor taking the CPU away.
    //  - load1: 1-min load average at pass end.
    //  - cpu_wall: JVM process-CPU seconds / wall seconds — on a busy
    //    local[32] bench this sits well above 1; a guest-wide stall
    //    inflates wall with flat process CPU, dropping the ratio for
    //    IDENTICAL work. The one signal that needs no host counters.
    def procStat(): (Long, Long) =
      try {
        val f = scala.io.Source.fromFile("/proc/stat").getLines().next()
          .trim.split("\\s+").drop(1).map(_.toLong)
        // denominator: user..steal only — guest/guest_nice (fields 9-10)
        // are already folded into user/nice on Linux, so summing all
        // fields double-counts them and under-reports steal_pct
        (if (f.length > 7) f(7) else 0L, f.take(8).sum)
      } catch { case _: Throwable => (0L, 0L) }
    def load1(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").getLines().next()
        .split("\\s+")(0).toDouble
      catch { case _: Throwable => -1.0 }
    def procCpuNanos(): Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
        case _ => -1L
      }

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
    val passHost = scala.collection.mutable.ArrayBuffer.empty[String]
    def timedPass(i: Int): Map[String, Double] = {
      val (steal0, jiffies0) = procStat()
      val cpu0 = procCpuNanos()
      val gc0 = gcMillis
      val w0 = System.nanoTime()
      val r = SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = runOne(name, fn, sfDir)
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
      val wallS = (System.nanoTime() - w0) / 1e9
      val (steal1, jiffies1) = procStat()
      val cpuS = if (cpu0 < 0) -1.0 else (procCpuNanos() - cpu0) / 1e9
      val stealPct = if (jiffies1 > jiffies0)
        100.0 * (steal1 - steal0) / (jiffies1 - jiffies0) else -1.0
      passHost += f"""{"pass":$i,"wall_s":$wallS%.1f,"proc_cpu_s":$cpuS%.1f,"cpu_wall":${if (wallS > 0 && cpuS >= 0) cpuS / wallS else -1.0}%.2f,"steal_pct":$stealPct%.2f,"load1":${load1()}%.2f,"gc_ms":${gcMillis - gc0}}"""
      System.err.println(
        f"[bench] pass $i total=${r.values.filter(_ >= 0).sum}%.1fs host=${passHost.last}")
      gcMark = snap(s"pass $i done", gcMark)
      r
    }
    val passes = Seq(timedPass(1), timedPass(2), timedPass(3))
    val results = SparkEntry.queries.keys.map { name =>
      val ts = passes.map(_(name))
      name -> (if (ts.exists(_ < 0)) -1.0 else ts.min)
    }.toSeq

    // Per-query historical floor: this round's min UNIONed with the
    // PRIOR committed artifact's value and floor (read before this run
    // overwrites the file), so the all-time steady-state floor survives
    // a slow host window — BENCH_r15's 302-348s passes vs 190-219s for
    // identical work made round totals a false regression signal twice.
    // A query whose CODE regressed still shows in "queries" (this
    // round's min); the floor answers "what does this plan cost on a
    // fair window", which queries alone cannot once a window is slow.
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL", "BENCH_full.json")
    val priorRoot =
      try Some(new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(fullPath)))))
      catch { case _: Throwable => None }
    // floors only union across runs of the SAME scale factor: one run
    // at a smaller SF would otherwise permanently contaminate the
    // committed floor with minima no sf0.1 plan can reach
    def priorMap(field: String): Map[String, Double] =
      priorRoot.filter(r =>
          Option(r.get("sf")).exists(_.asText() == sfDir))
        .flatMap(r => Option(r.get(field))).map { node =>
          import scala.jdk.CollectionConverters._
          node.properties().asScala
            .map(e => e.getKey -> e.getValue.asDouble()).toMap
        }.getOrElse(Map.empty)
    val priorQ = priorMap("queries")
    val priorFloor = priorMap("historical_floor")
    val floor = results.map { case (name, v) =>
      val cands = Seq(Some(v).filter(_ >= 0), priorQ.get(name).filter(_ >= 0),
        priorFloor.get(name).filter(_ >= 0)).flatten
      name -> (if (cands.isEmpty) -1.0 else cands.min)
    }

    val failed = results.collect { case (k, v) if v < 0 => s"\"" + k + "\"" }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val floorJson = floor.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val floorTotal = floor.collect { case (_, v) if v >= 0 => v }.sum
    val passTotals = passes.map(_.values.filter(_ >= 0).sum)
      .map(t => f"$t%.3f").mkString("[", ",", "]")
    // detail line first, compact total LAST: the driver captures the tail
    // of the log, and the long per-query map was truncated in BENCH_r02 —
    // the last line must always carry the headline number.
    val detail = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":${failed.mkString("[", ",", "]")},"runs":3,"agg":"min","pass_totals":$passTotals,"pass_host":${passHost.mkString("[", ",", "]")},"historical_floor":$floorJson,"floor_total":$floorTotal,"sf":"$sfDir"}"""
    println(detail)
    // the driver's tail capture truncates the long per-query map
    // (BENCH_r06/r07 shipped "parsed": null), so ALSO write the full
    // detail line to a tracked file — round-over-round per-query deltas
    // stay complete regardless of log truncation. Path is cwd-relative
    // under sbt (the repo root); override with SPARK_GRAFT_BENCH_FULL
    // when launching from elsewhere (e.g. spark-submit).
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(fullPath), detail + "\n")
    catch { case e: java.io.IOException =>
      System.err.println(s"[bench] could not write $fullPath: $e") }
    spark.stop()
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"n_failed":${failed.size},"runs":3,"agg":"min","floor_total":$floorTotal%.3f,"pass_host":${passHost.mkString("[", ",", "]")},"sf":"$sfDir"}""")
  }
}
