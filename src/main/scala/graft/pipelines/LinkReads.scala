package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Linkage, Upsert}

/** The reads-discovery + linkage pipeline (SURVEY §3.2 — update_reads.py):
  *
  *  1. S3-listing discovery merged into `reads` with `$setOnInsert`
  *     (never clobbers enrichments, update_reads.py:46-56);
  *  2. pre-clean `$pull` of ""/"NaN" from `files` (:190-193);
  *  3. tiered linkage (scalable path) + conflict resolution;
  *  4. per-sample aggregates merged with `$addToSet` files + `$set`
  *     received/filesize_sum (:255-273);
  *  5. matched reads marked non-orphan (:275-284).
  *
  * Two shuffles end-to-end at scale: the linkage equi join and the merge;
  * everything else is narrow or broadcast.
  */
object LinkReads {

  /** Step 1 — discovery: merge a fresh listing (file_name, filesize,
    * mdate) into the reads table insert-only; new files start orphan. */
  def discover(reads: DataFrame, listing: DataFrame): DataFrame = {
    val incoming = listing.withColumn("orphan", lit(true))
    val policies = incoming.columns.filterNot(_ == "file_name")
      .map(_ -> (Upsert.SetOnInsert: Upsert.Policy)).toMap
    Upsert.merge(reads, incoming, Seq("file_name"), policies)
  }

  /** Steps 2–5 — link and merge. Returns (updatedSamples, updatedReads). */
  def run(samples: DataFrame, reads: DataFrame): (DataFrame, DataFrame) = {
    val cleaned = samples.withColumn("files",
      when(col("files").isNotNull, Upsert.pull(col("files"), Seq("", "NaN"))))
    val linked = Linkage.resolveConflicts(
      Linkage.linkScalable(cleaned, reads))
    val agg = Linkage.aggregates(linked)
    val updatedSamples = Upsert.merge(cleaned, agg, Seq("sample_name"),
      Map("files" -> Upsert.AddToSet))
    val updatedReads = Linkage.markOrphans(reads, linked)
    (updatedSamples, updatedReads)
  }
}
