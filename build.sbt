ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "confluentkafkavectorsearchpromptinferencespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Clamp the heap: on this rig JVM heaps >16g trigger whole-VM page-fault
// stalls (host memory reclaim freezes the microVM while the JVM faults
// pages in bursts — root-caused in commit fda8e7e; BENCH_r01 lost ~150s
// to a ~90g harness-supplied heap). sf0.1 fits comfortably in 8g.
val driverMemMb: Long = {
  val raw = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g").trim.toLowerCase
  // tolerate fractional/garbled specs ("1.5g", "") — fall back to 8g
  // rather than failing every sbt command at load time
  val mb = scala.util.Try {
    if (raw.endsWith("g")) (raw.dropRight(1).toDouble * 1024).toLong
    else if (raw.endsWith("m")) raw.dropRight(1).toDouble.toLong
    else raw.toDouble.toLong / (1024 * 1024) // bare bytes
  }.getOrElse(8 * 1024L)
  math.min(math.max(mb, 1024L), 16 * 1024L)
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${driverMemMb}m",
  // Dozens of distinct whole-stage-codegen classes exhaust the default
  // 240 MB code cache over a long session; the JIT then silently disables
  // compilation and random queries run interpreted 10-20x slower.
  "-XX:ReservedCodeCacheSize=1g",
)
