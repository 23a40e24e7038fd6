ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ccgpdatawranglingspark"
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
// Default forked-JVM heap scales with the host: 28g keeps the sf0.1
// bench sweep out of GC churn on the 128 GiB bench machine, but would
// swap/OOM-kill a small laptop, so hosts under 64 GiB get a
// conservative 8g. SPARK_DRIVER_MEM overrides either way.
val defaultHeap: String = {
  val memTotalKb =
    try scala.io.Source.fromFile("/proc/meminfo").getLines()
      .collectFirst { case l if l.startsWith("MemTotal:") =>
        l.trim.split("\\s+")(1).toLong }
      .getOrElse(0L)
    catch { case _: Throwable => 0L } // non-Linux: assume small
  // 60 GiB cutoff, not 64: MemTotal on a nominal 64 GiB host reads
  // ~65M kB after kernel reservations and must still qualify
  if (memTotalKb >= 60L * 1024 * 1024) "28g" else "8g"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", defaultHeap)}",
)
// Pipe forked `run` output straight through: sbt's default logger wraps
// every stdout line in "[info] ", which breaks anything parsing Bench's
// one-line JSON contract from the process output.
run / outputStrategy := Some(StdoutOutput)
