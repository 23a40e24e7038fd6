package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.StreamingIngest
import org.apache.spark.sql.Column

class StreamingSpec extends SparkSpec {

  implicit class Interp(private val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("streaming tumbling-window counts match the batch aggregation") {
    val batchEvents = Tables.load(spark, sfDir, "events")
    // landing dir with the events as parquet parts
    val landing = tmpDir("graft-landing")
    batchEvents.write.mode("overwrite").parquet(landing)

    val schema = spark.read.parquet(landing).schema
    val stream = StreamingIngest.landingStream(spark, landing, schema)
    val agg = StreamingIngest.arrivalCounts(stream)
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory").queryName("arrivals")
      .start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("arrivals")
      .select($"window_start", $"event_type", $"n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val want = batchEvents
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start", $"event_type", $"n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("insert-only merge sink: ledger skips processed files, never clobbers") {
    import spark.implicits._
    val landing = tmpDir("graft-landing2")
    val target = tmpDir("graft-target") + "/table"
    val checkpoint = tmpDir("graft-ckpt")

    // batch 1: two keys
    Seq(("k1", "v1"), ("k2", "v2")).toDF("key", "value")
      .write.mode("append").parquet(landing)
    val schema = spark.read.parquet(landing).schema
    def runOnce(): Unit = {
      val q = StreamingIngest.insertOnlyMergeSink(
        StreamingIngest.landingStream(spark, landing, schema),
        target, Seq("key"), checkpoint).start()
      try q.awaitTermination() finally q.stop()
    }
    runOnce()
    val after1 = spark.read.parquet(target).as[(String, String)].collect().toMap
    assert(after1 === Map("k1" -> "v1", "k2" -> "v2"))

    // batch 2: k2 reappears with a DIFFERENT value (must not clobber), k3 new
    Seq(("k2", "CLOBBER"), ("k3", "v3")).toDF("key", "value")
      .write.mode("append").parquet(landing)
    runOnce()
    val after2 = spark.read.parquet(target).as[(String, String)].collect().toMap
    assert(after2 === Map("k1" -> "v1", "k2" -> "v2", "k3" -> "v3"))

    // rerun with nothing new: checkpoint = ledger; state unchanged
    runOnce()
    val after3 = spark.read.parquet(target).as[(String, String)].collect().toMap
    assert(after3 === after2)
  }
}
