package graft

/** Scratch profiling main: full suite with INFO logging around slow
  * queries — prints query boundaries so log timestamps can be aligned.
  */
object ProfMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("INFO")
    SparkEntry.queries.keys.foreach { n =>
      System.err.println(s"##### BEGIN $n ${System.currentTimeMillis()}")
      val t0 = System.nanoTime()
      try SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"[prof] $n FAILED $e") }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"##### END $n $dt%.2f ${System.currentTimeMillis()}")
      println(f"[prof] $dt%8.2f s  $n")
    }
    spark.stop()
  }
}
