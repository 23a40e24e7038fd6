package graft

import org.apache.spark.sql.functions._
import graft.pipelines.VarianceReport

class VarianceReportSpec extends SparkSpec {

  import spark.implicits._

  private val genomeSizes = Seq(
    ("P1", "2500000000", "2000000000"),   // primary used
    ("P2", "NA", "1000000000"),           // fallback used (J10)
    ("P3", "NA", null.asInstanceOf[String]))  // unresolvable
    .toDF("project_id", "size", "fallback_size")

  private val samples = Seq(
    ("a1", "P1", 1000000000L),   // reads ~ 13.5M, depth ~ 0.812
    ("a2", "P1", 0L),            // used=false, depth 0
    ("b1", "P2", 2000000000L),   // fallback genome size
    ("c1", "P3", 500000000L),    // no genome size -> null depth
    ("d1", "P4", 500000000L))    // project absent from dim -> null depth
    .toDF("sample_name", "ccgp_project_id", "filesize_sum")

  test("per-sample: sentinel semantics and the reference's constants") {
    val rows = VarianceReport.perSample(samples, genomeSizes)
      .collect().map(r => r.getAs[String]("sample_name") -> r).toMap
    val a1 = rows("a1")
    assert(a1.getAs[Double]("expected_reads") ===
      math.round(1000000000L * 0.013534218984527578).toDouble)
    assert(a1.getAs[Double]("expected_depth") ===
      math.rint(math.round(1000000000L * 0.013534218984527578).toDouble * 150 / 2.5e9 * 1000) / 1000)
    // fallback genome size resolves (P2)
    assert(!rows("b1").isNullAt(rows("b1").fieldIndex("expected_depth")))
    // unresolvable genome size -> null depth, reads still computed
    assert(rows("c1").isNullAt(rows("c1").fieldIndex("expected_depth")))
    assert(!rows("c1").isNullAt(rows("c1").fieldIndex("expected_reads")))
    assert(rows("d1").isNullAt(rows("d1").fieldIndex("expected_depth")))
  }

  test("per-project: averages ignore null depths; QC counters; used vs considered") {
    val rows = VarianceReport.perProject(samples, genomeSizes)
      .collect().map(r => r.getAs[String]("ccgp_project_id") -> r).toMap
    val p1 = rows("P1")
    assert(p1.getAs[Long]("samples_considered") === 2)
    assert(p1.getAs[Long]("samples_used") === 1)
    assert(p1.getAs[Long]("n_below_5x") === 2)  // 0.81x and 0x both < 5
    // P3: all depths null -> avg null, counters 0
    val p3 = rows("P3")
    assert(p3.isNullAt(p3.fieldIndex("project_avg_depth")))
    assert(p3.getAs[Long]("n_below_5x") === 0)
  }
}
