package graft

/** Scratch dev main: print formatted physical plans for named queries
  * (e.g. `runMain graft.ProfMain /root/testdata/sf0.01 q_vector_topk`),
  * or time them with `-t name...`.
  */
object ProfMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local()
    val (timeMode, names) =
      if (args.length > 1 && args(1) == "-t") (true, args.drop(2).toSeq)
      else (false, args.drop(1).toSeq)
    names.foreach { name =>
      if (timeMode) {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"[prof] ${(System.nanoTime() - t0) / 1e9}%8.2f s  $name")
      } else {
        println(s"\n########## $name")
        SparkEntry.queries(name)(spark, dir).explain("formatted")
      }
    }
    spark.stop()
  }
}
