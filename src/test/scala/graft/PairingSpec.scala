package graft

import org.apache.spark.sql.functions._
import graft.ops.Pairing

/** Pairing goldens vs create_sheets.py:20-64 (fuzzy J5) and
  * create_sheets_ultimate.py:388-423 (positional J6), including the
  * pathological substring-prefix case the reference's comment documents. */
class PairingSpec extends SparkSpec {

  import spark.implicits._

  private def mkSamples(rows: (String, Seq[String])*) =
    rows.toSeq.toDF("sample_name", "files")
      .withColumn("organism", lit("Genus species"))

  test("positional: consecutive pairs of the sorted list, even lengths only") {
    val df = mkSamples(
      "p1" -> Seq("b_R2.fq.gz", "a_R1.fq.gz"),
      "p2" -> Seq("d", "c", "b", "a"),
      "podd" -> Seq("x", "y", "z"))
    val out = Pairing.pairPositional(df, organismCol = "organism")
      .orderBy("sample_name", "pair_id").collect()
    val bySample = out.groupBy(_.getAs[String]("sample_name"))
    assert(bySample("p1").map(r => (r.getAs[String]("filename"), r.getAs[String]("filename2"))).toSeq
      === Seq(("a_R1.fq.gz", "b_R2.fq.gz")))
    assert(bySample("p2").map(r => (r.getAs[String]("filename"), r.getAs[String]("filename2"))).toSeq
      === Seq(("a", "b"), ("c", "d")))
    assert(!bySample.contains("podd"))
    // library_ID and title derived per reference
    assert(bySample("p1")(0).getAs[String]("library_ID") === "a")
    assert(bySample("p1")(0).getAs[String]("title") === "Whole genome sequencing of Genus species")
  }

  test("positional: map-typed payload survives and duplicate rows pair per-row") {
    // The reference iterates rows (create_sheets_ultimate.py:394-419), so two
    // identical sample rows each yield their own pair; a MapType payload
    // column (the SURVEY §1.4 `extra` contract) must ride through — a
    // groupBy on all input columns would throw on the map.
    val df = Seq(
      ("dup", Seq("r2.fq", "r1.fq"), Map("note" -> "a")),
      ("dup", Seq("r2.fq", "r1.fq"), Map("note" -> "a")),
      ("solo", Seq("y.fq", "x.fq"), Map("note" -> "b")))
      .toDF("sample_name", "files", "extra")
      .withColumn("organism", lit("Genus species"))
    val out = Pairing.pairPositional(df, organismCol = "organism").collect()
    val dups = out.filter(_.getAs[String]("sample_name") == "dup")
    assert(dups.length === 2)  // one pair per duplicate input row
    assert(dups.forall(r => r.getAs[String]("filename") == "r1.fq" &&
      r.getAs[String]("filename2") == "r2.fq" &&
      r.getAs[Map[String, String]]("extra") == Map("note" -> "a")))
    val solo = out.filter(_.getAs[String]("sample_name") == "solo")
    assert(solo.map(r => (r.getAs[String]("filename"), r.getAs[String]("filename2"))).toSeq
      === Seq(("x.fq", "y.fq")))
  }

  test("fuzzy: 2-file samples pair directly; quadruples pair per lane prefix") {
    val df = mkSamples(
      "q1" -> Seq("s1_R2.fq.gz", "s1_R1.fq.gz"),
      "q2" -> Seq("a_L001_R1.fq.gz", "a_L001_R2.fq.gz", "a_L002_R1.fq.gz", "a_L002_R2.fq.gz"),
      "q3" -> Seq("only", "three", "files3"))
    val out = Pairing.pairFuzzy(df).collect()
    val bySample = out.groupBy(_.getAs[String]("sample_name"))
    assert(bySample("q1").map(r => (r.getAs[String]("filename"), r.getAs[String]("filename2"))).toSeq
      === Seq(("s1_R1.fq.gz", "s1_R2.fq.gz")))
    val q2pairs = bySample("q2")
      .map(r => Set(r.getAs[String]("filename"), r.getAs[String]("filename2"))).toSet
    assert(q2pairs === Set(
      Set("a_L001_R1.fq.gz", "a_L001_R2.fq.gz"),
      Set("a_L002_R1.fq.gz", "a_L002_R2.fq.gz")))
    assert(!bySample.contains("q3"))  // 3-file shape drops (reference behavior)
  }

  test("fuzzy: the reference's pathological substring-prefix case") {
    // create_sheets.py:43-46 comment: samp_a1_R1 vs samp_a1_L001_R1 —
    // prefix 'samp_a1' must pair the short files, 'samp_a1_L001' the lane files
    val df = mkSamples("path" -> Seq(
      "samp_a1_R1.fq.gz", "samp_a1_R2.fq.gz",
      "samp_a1_L001_R1.fq.gz", "samp_a1_L001_R2.fq.gz"))
    val pairs = Pairing.pairFuzzy(df).collect()
      .map(r => Set(r.getAs[String]("filename"), r.getAs[String]("filename2"))).toSet
    assert(pairs === Set(
      Set("samp_a1_R1.fq.gz", "samp_a1_R2.fq.gz"),
      Set("samp_a1_L001_R1.fq.gz", "samp_a1_L001_R2.fq.gz")))
  }
}
