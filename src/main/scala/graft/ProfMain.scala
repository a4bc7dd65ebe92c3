package graft

/** Scratch profiling main: print formatted plans for named queries. */
object ProfMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local()
    args.drop(1).foreach { name =>
      println(s"\n########## $name")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
