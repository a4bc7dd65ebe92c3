package graft

/** Dev smoke: the driver's t1 gate (entry rows>0 on sf0.001) plus a
  * sample of the flagship output, and a bad-input probe on the model
  * registry / metric dispatch.
  */
object SmokeMain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val e = SparkEntry.entry(spark)
    val n = e.count()
    println(s"[smoke] entry rows=$n")
    e.show(3, 120, vertical = true)
    // probe: unknown metric and unknown model must fail loudly
    val err1 = try { graft.operators.VectorSearch.scoreCol("manhattan")(null, null); "NO-ERROR" }
    catch { case ex: Throwable => ex.getMessage }
    println(s"[smoke] bad metric -> $err1")
    val err2 = try { graft.model.Models.default().resolve("no_such_model"); "NO-ERROR" }
    catch { case ex: Throwable => ex.getMessage }
    println(s"[smoke] bad model -> $err2")
    val err3 = try { graft.model.Models.default().resolve("retail_assistant$9"); "NO-ERROR" }
    catch { case ex: Throwable => ex.getMessage }
    println(s"[smoke] bad version -> $err3")
    spark.stop()
  }
}
