package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** F24 — md5 integrity verification (download_reads.smk:52-79): the
  * workflow's `md5sum -c` gate as a relational operator. Content digests
  * are computed distributed over the binaryFile source and joined to the
  * manifest; the result classifies every file as ok / corrupt / missing /
  * unexpected. The reference STOPS the workflow on any failure — callers
  * get the full classification and decide. */
object Integrity {

  /** Digest a directory of files (distributed; each task hashes its
    * split's files). */
  def digests(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)
      .select(
        element_at(split(col("path"), "/"), -1).as("file_name"),
        md5(col("content")).as("md5_actual"))

  /** Verify against a manifest (file_name, md5_expected). */
  def verify(actual: DataFrame, manifest: DataFrame): DataFrame =
    actual.join(manifest, Seq("file_name"), "full_outer")
      .select(col("file_name"),
        when(col("md5_actual").isNull, "missing")
          .when(col("md5_expected").isNull, "unexpected")
          .when(col("md5_actual") === col("md5_expected"), "ok")
          .otherwise("corrupt").as("status"),
        col("md5_actual"), col("md5_expected"))

  /** The Snakemake-checkpoint semantics: true iff every manifest entry
    * verified ok. */
  def allOk(verified: DataFrame): Boolean =
    verified.where(col("status") =!= "ok").isEmpty
}
