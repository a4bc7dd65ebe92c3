package graft

/** Scratch profiling main: full double pass; arg2 = recycle period N
  * (recreate the SparkSession+Context every N timed queries; 0 = never).
  */
object ProfMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val recycle = if (args.length > 1) args(1).toInt else 0
    var spark = GraftSession.local()
    def run(name: String, d: String, timed: Boolean): Unit = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, d).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"[prof] $name FAILED $e") }
      if (timed) println(f"[prof] ${(System.nanoTime() - t0) / 1e9}%8.2f s  $name")
    }
    SparkEntry.queries.keys.foreach(n => run(n, "/root/testdata/sf0.001", timed = false))
    println("[prof] === warmup done ===")
    var i = 0
    SparkEntry.queries.keys.foreach { n =>
      if (recycle > 0 && i > 0 && i % recycle == 0) {
        spark.stop()
        org.apache.spark.sql.SparkSession.clearActiveSession()
        org.apache.spark.sql.SparkSession.clearDefaultSession()
        spark = GraftSession.local()
      }
      run(n, dir, timed = true)
      i += 1
    }
    spark.stop()
  }
}
