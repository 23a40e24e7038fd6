package graft

import org.apache.spark.sql.SparkSession

/** Judge diagnostic — NOT part of the engine. Runs a named subset of
  * SparkEntry.queries at a given SF dir, printing per-query wall time. */
object JudgeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = LocalSession.build("32",
      Map("spark.sql.adaptive.enabled" -> "true"))
    names.foreach { n =>
      val t0 = System.nanoTime()
      val r = try { SparkEntry.queries(n)(spark, sfDir).count().toString }
              catch { case e: Throwable => "ERR " + e.toString.take(200) }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $n%-28s $dt%8.2f s  rows=$r")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
