package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S6 — object-store listing scan (update_reads.py:24-35: bucket
  * listing → (key, size, last_modified)).
  *
  * Uses Spark's `binaryFile` source with the content column dropped
  * immediately: the format prunes the `content` column when unselected,
  * so this is a metadata-only listing that distributes across executors
  * (each lists/stats its split of files) — the scalable replacement for
  * a driver-side `bucket.objects.all()` loop. A glob keeps non-matching
  * objects out at the source.
  */
object Listing {

  def listFiles(spark: SparkSession, dir: String,
      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        // basename = the reference's object key
        element_at(split(col("path"), "/"), -1).as("file_name"),
        col("path"),
        col("length").as("filesize"),
        col("modificationTime").as("mdate"))
}
