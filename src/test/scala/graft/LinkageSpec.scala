package graft

import org.apache.spark.sql.functions._
import graft.ops.Linkage

/** Golden tests for the linkage join against the reference's semantics
  * (update_reads.py:64-163; see Fixtures for the case inventory). */
class LinkageSpec extends SparkSpec {

  private lazy val samples = Fixtures.samples(spark).cache()
  private lazy val reads = Fixtures.reads(spark).cache()

  private def linkedMap(df: org.apache.spark.sql.DataFrame): Map[String, Set[String]] =
    df.collect()
      .groupBy(_.getAs[String]("sample_name"))
      .map { case (k, rows) => k -> rows.map(_.getAs[String]("file_name")).toSet }

  test("faithful linkage: every tier case from the reference") {
    val out = linkedMap(Linkage.linkFaithful(samples, reads))
    // tier 1: all four lane files
    assert(out("s1") === Set(
      "CC131_SelS_S1_L001_R1_001.fastq.gz", "CC131_SelS_S1_L001_R2_001.fastq.gz",
      "CC131_SelS_S1_L002_R1_001.fastq.gz", "CC131_SelS_S1_L002_R2_001.fastq.gz"))
    // tier 2 (_ -> -)
    assert(out("s2") === Set("AB-1_R1.fastq.gz", "AB-1_R2.fastq.gz"))
    // tier 2b (- -> _, bare contains)
    assert(out("s3") === Set("CD_2_R1.fastq.gz", "CD_2_R2.fastq.gz"))
    // tier 3 (strip -)
    assert(out("s4") === Set("GH_4x_R1.fastq.gz"))
    // gated sample: absent
    assert(!out.contains("s5"))
    // tier matched only non-gz: absent after filter
    assert(!out.contains("s6"))
    // unmatched: absent
    assert(!out.contains("s7"))
    // comma multi-id: ONLY first id probed -> no link to NN_8 file
    assert(!out.contains("s8"))
    // conflict file matches both candidates pre-resolution
    assert(out("X1").contains("X1_shared_R1.fastq.gz"))
    assert(out("X1_shared").contains("X1_shared_R1.fastq.gz"))
  }

  test("scalable (prefix-equi + fallback) produces the same linkage as faithful") {
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select("sample_name", "file_name", "tier").collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val faithful = collect(Linkage.linkFaithful(samples, reads))
    val scalable = collect(Linkage.linkScalable(samples, reads))
    assert(faithful === scalable)
  }

  test("scalable: mid-name file links even when the sample also has a prefix-aligned equi hit") {
    // regression: prefix-only keys generated no candidate for
    // resub_MID_10_R2.fastq.gz, and the per-sample fallback skipped s10
    // because MID_10_R1 had already equi-matched — silently dropping the file
    val out = linkedMap(Linkage.linkScalable(samples, reads))
    assert(out("s10") === Set("MID_10_R1.fastq.gz", "resub_MID_10_R2.fastq.gz"))
  }

  test("conflict resolution: highest fuzz ratio wins the shared file") {
    val resolved = linkedMap(
      Linkage.resolveConflicts(Linkage.linkFaithful(samples, reads)))
    // 'X1_shared' is much closer to 'X1_shared_R1.fastq.gz' than 'X1'
    assert(resolved("X1_shared").contains("X1_shared_R1.fastq.gz"))
    assert(!resolved.get("X1").exists(_.contains("X1_shared_R1.fastq.gz")))
  }

  test("aggregates: sorted files, min mdate as received, filesize sum") {
    val agg = Linkage.aggregates(Linkage.linkFaithful(samples, reads))
      .collect().map(r => r.getAs[String]("sample_name") -> r).toMap
    val s1 = agg("s1")
    assert(s1.getAs[scala.collection.Seq[String]]("files") ===
      s1.getAs[scala.collection.Seq[String]]("files").sorted)
    assert(s1.getAs[Long]("filesize_sum") === 100L + 110L + 120L + 130L)
    assert(s1.getAs[java.sql.Timestamp]("received") ===
      java.sql.Timestamp.valueOf("2023-01-01 00:00:00"))
  }

  test("orphan marking: matched reads non-orphan, unmatched stay orphan") {
    val linked = Linkage.linkFaithful(samples, reads)
    val marked = Linkage.markOrphans(reads, linked)
      .collect().map(r => r.getAs[String]("file_name") -> r.getAs[Boolean]("orphan")).toMap
    assert(marked("CC131_SelS_S1_L001_R1_001.fastq.gz") === false)
    assert(marked("AB-1_R1.fastq.gz") === false)
    assert(marked("ORPHAN_X_R1.fastq.gz") === true)
    assert(marked("GATED_5_R1.fastq.gz") === true)  // gated sample's file
    assert(marked("S6_1_R1.fastq") === true)        // non-gz never linked
    assert(marked("NN_8_R1.fastq.gz") === true)     // second comma-id file
  }

  test("end-to-end merge: $addToSet files + $set received/filesize_sum (s9 keeps junk-cleaned existing)") {
    import graft.ops.Upsert
    val linked = Linkage.resolveConflicts(Linkage.linkFaithful(samples, reads))
    val agg = Linkage.aggregates(linked)
      .withColumnRenamed("sample_name", "sample_name")
    val cleaned = samples.withColumn("files",
      Upsert.pull(col("files"), Seq("", "NaN")))
    val merged = Upsert.merge(cleaned, agg, Seq("sample_name"),
      Map("files" -> Upsert.AddToSet))
    val s9 = merged.where(col("sample_name") === "s9").collect()(0)
    // existing junk pulled; existing real file kept; new R2 added (dedup)
    assert(s9.getAs[scala.collection.Seq[String]]("files").sorted ===
      Seq("PP_9_R1.fastq.gz", "PP_9_R2.fastq.gz"))
    assert(s9.getAs[Long]("filesize_sum") === 910L + 920L)
  }

  test("fellegiSunter: hand-computed weights/scores; null disagrees; " +
      "blocking bounds the pair space") {
    import spark.implicits._
    val c1 = Linkage.FsComparator("f1", 0.9, 0.1)
    val c2 = Linkage.FsComparator("f2", 0.8, 0.01)
    // golden weights: floor(1e6 ln(m/u)) / floor(1e6 ln((1-m)/(1-u)))
    assert(c1.wAgreeQ6 === math.floor(1e6 * math.log(9.0)).toLong)
    assert(c1.wDisagreeQ6 === math.floor(1e6 * math.log(0.1 / 0.9)).toLong)
    val rows = Seq(
      (1L, "b1", Some(10L), Some(5L)),
      (2L, "b1", Some(10L), Some(5L)),   // agrees with 1 on both
      (3L, "b1", Some(99L), None),       // disagrees f1, null f2
      (4L, "b2", Some(10L), Some(5L)))   // other block: never paired w/ 1-3
    val df = rows.toDF("id", "blk", "f1", "f2")
      .select($"id", $"blk",
        $"f1".cast("long").as("f1"), $"f2".cast("long").as("f2"))
    val out = Linkage.fellegiSunterSelf(df, "id", Seq("blk"),
        Seq(c1, c2), upperQ6 = c1.wAgreeQ6 + c2.wAgreeQ6, lowerQ6 = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getAs[Long]("score_q6"), r.getAs[Long]("n_agree"),
          r.getAs[String]("verdict")))).toMap
    // blocking: only within-b1 pairs (3 of them), b2 is a singleton
    assert(out.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(out((1L, 2L)) ===
      ((c1.wAgreeQ6 + c2.wAgreeQ6, 2L, "match")))
    // null f2 on id 3 counts as DISAGREEMENT
    assert(out((1L, 3L)) ===
      ((c1.wDisagreeQ6 + c2.wDisagreeQ6, 0L, "non_match")))
    assert(out((2L, 3L)) === out((1L, 3L)))
  }
}
