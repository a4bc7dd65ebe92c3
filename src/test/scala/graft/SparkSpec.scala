package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM-wide SparkSession keeps the
  * suite runtime dominated by actual work, not session startup).
  */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]", "4").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val Sf = "/root/testdata/sf0.001"
}

trait SparkSpec extends AnyFunSuite {
  // lazy val (not def): a stable identifier, so `import spark.implicits._`
  // works in subclasses.
  lazy val spark: SparkSession = SparkSpec.spark
  def sf: String = SparkSpec.Sf
}
