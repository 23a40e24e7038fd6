package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reference-shaped fixtures (FIXTURES.md B4/B5): a samples table and an
  * S3-listing-shaped reads table covering every linkage edge case the
  * reference exhibits — paired R1/R2, multi-lane quadruples, separator
  * variants that only match after rewrites, non-.gz files, one file
  * matched by two samples (conflict), comma multi-ids, gating, orphans.
  */
object Fixtures {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  final case class Sample(
      sample_name: String,
      minicore_seq_id: String,
      minicore_sequenced: String,
      organism: String,
      files: Seq[String])

  final case class Read(
      file_name: String,
      filesize: Long,
      mdate: Timestamp,
      orphan: Boolean)

  def samples(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      // tier 1: id appears with separator
      Sample("s1", "CC131_SelS", "YES", "Sceloporus occidentalis", Seq()),
      // tier 2: matches only after _ -> -
      Sample("s2", "AB_1", "YES", "Genus species", Seq()),
      // tier 2b: no _, has -; matches after - -> _ (bare contains)
      Sample("s3", "CD-2", "YES", "Genus species", Seq()),
      // tier 3: id has _ and -; matches only after stripping -
      Sample("s4", "GH_4-x", "YES", "Genus species", Seq()),
      // gated off: minicore_sequenced = NO (its file must stay orphan)
      Sample("s5", "GATED_5", "NO", "Genus species", Seq()),
      // tier-1 match is non-gz only: tier wins, then gz filter empties it
      Sample("s6", "S6_1", "YES", "Genus species", Seq()),
      // no match at all
      Sample("s7", "ZZ_9", "YES", "Genus species", Seq()),
      // comma multi-id: ONLY the first id is probed (reference quirk)
      Sample("s8", "MM_8,NN_8", "YES", "Genus species", Seq()),
      // conflict pair: both match the shared file; fuzz decides
      Sample("X1", "X1", "YES", "Genus species", Seq()),
      Sample("X1_shared", "X1_shared", "YES", "Genus species", Seq()),
      // existing files incl. ""/"NaN" junk entries ($pull pre-clean)
      Sample("s9", "PP_9", "YES", "Genus species", Seq("", "NaN", "PP_9_R1.fastq.gz")),
      // mid-name case: one file starts with the id, one buries it after a
      // resubmission prefix — both must link (regression for the equi path)
      Sample("s10", "MID_10", "YES", "Genus species", Seq())
    ).toDF()
  }

  def reads(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      // s1 multi-lane quadruple (L001/L002 × R1/R2)
      Read("CC131_SelS_S1_L001_R1_001.fastq.gz", 100, ts("2023-01-02 00:00:00"), true),
      Read("CC131_SelS_S1_L001_R2_001.fastq.gz", 110, ts("2023-01-01 00:00:00"), true),
      Read("CC131_SelS_S1_L002_R1_001.fastq.gz", 120, ts("2023-01-03 00:00:00"), true),
      Read("CC131_SelS_S1_L002_R2_001.fastq.gz", 130, ts("2023-01-04 00:00:00"), true),
      // s2: only matches with dashes (AB-1), original id AB_1
      Read("AB-1_R1.fastq.gz", 200, ts("2023-02-01 00:00:00"), true),
      Read("AB-1_R2.fastq.gz", 210, ts("2023-02-02 00:00:00"), true),
      // s3: file uses underscores, sample id uses dash (CD-2 -> CD_2)
      Read("CD_2_R1.fastq.gz", 300, ts("2023-03-01 00:00:00"), true),
      Read("CD_2_R2.fastq.gz", 310, ts("2023-03-02 00:00:00"), true),
      // s4: matches GH_4x (id GH_4-x with '-' stripped)
      Read("GH_4x_R1.fastq.gz", 400, ts("2023-04-01 00:00:00"), true),
      // s5's file: present but the sample is gated off
      Read("GATED_5_R1.fastq.gz", 500, ts("2023-05-01 00:00:00"), true),
      // s6: tier-1 match that is NOT .gz
      Read("S6_1_R1.fastq", 600, ts("2023-06-01 00:00:00"), true),
      // s8: file matching the SECOND comma id (must NOT link)
      Read("NN_8_R1.fastq.gz", 800, ts("2023-08-01 00:00:00"), true),
      // conflict file: contains both X1_ and X1_shared_
      Read("X1_shared_R1.fastq.gz", 900, ts("2023-09-01 00:00:00"), true),
      // s9 existing + a new file
      Read("PP_9_R1.fastq.gz", 910, ts("2023-10-01 00:00:00"), true),
      Read("PP_9_R2.fastq.gz", 920, ts("2023-10-02 00:00:00"), true),
      // s10: prefix-aligned file AND a mid-name file (id after 'resub_')
      Read("MID_10_R1.fastq.gz", 1000, ts("2023-11-01 00:00:00"), true),
      Read("resub_MID_10_R2.fastq.gz", 1010, ts("2023-11-02 00:00:00"), true),
      // pure orphan
      Read("ORPHAN_X_R1.fastq.gz", 999, ts("2023-12-01 00:00:00"), true)
    ).toDF()
  }
}
