package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.io.Layout

class LayoutSpec extends SparkSpec {

  test("partitioned layout: per-project scans prune to one partition") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-layout").toString + "/samples"
    val df = Seq(
      ("s1", "P1", 1.0), ("s2", "P1", 2.0), ("s3", "P2", 3.0), ("s4", "P3", 4.0))
      .toDF("sample_name", "ccgp_project_id", "v")
    Layout.writePartitioned(df, dir)

    val scan = spark.read.parquet(dir).where(col("ccgp_project_id") === "P1")
    assert(scan.count() === 2)
    val plan = scan.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the predicate became a partition filter (pruned scan), not a data filter
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("ccgp_project_id"), plan)
  }

  test("salted join equals the plain join (inner and left)") {
    import spark.implicits._
    // skewed big side: one hot key
    val big = (1 to 1000).map(i => (if (i % 10 == 0) "cold" + i else "HOT", i))
      .toDF("key", "v")
    val small = Seq(("HOT", "h"), ("cold10", "c10"), ("missing", "m"))
      .toDF("key", "label")
    for (jt <- Seq("inner", "left")) {
      val plain = big.join(small, Seq("key"), jt)
        .select("key", "v", "label").collect().map(_.toString).sorted
      val salted = Layout.saltedJoin(big, small, "key", 8, jt)
        .select("key", "v", "label").collect().map(_.toString).sorted
      assert(plain.sameElements(salted), s"mismatch for $jt")
    }
  }

  test("salted join rejects right/full outer (replicas would surface)") {
    import spark.implicits._
    val big = Seq(("k", 1)).toDF("key", "v")
    val small = Seq(("k", "l"), ("unmatched", "u")).toDF("key", "label")
    for (jt <- Seq("right", "full", "full_outer"))
      assertThrows[IllegalArgumentException](
        Layout.saltedJoin(big, small, "key", 4, jt))
  }

  test("done-marker gate: marker appears only after the write succeeds; log sink writes lines") {
    import graft.io.Sinks
    val dir = Files.createTempDirectory("graft-marker").toString
    val marker = s"$dir/stage_done.txt"
    assert(!Sinks.markerExists(spark, marker))
    // failing write: no marker
    assertThrows[RuntimeException](
      Sinks.withDoneMarker(spark, marker) { throw new RuntimeException("boom") })
    assert(!Sinks.markerExists(spark, marker))
    // succeeding write: marker gates downstream
    Sinks.withDoneMarker(spark, marker) {
      Sinks.writeLog(spark, Seq("Found 2 reads.", "Found 1 samples."), s"$dir/log")
    }
    assert(Sinks.markerExists(spark, marker))
    val lines = spark.read.text(s"$dir/log").collect().map(_.getString(0)).toSet
    assert(lines === Set("Found 2 reads.", "Found 1 samples."))
  }
}
