package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Upsert

/** Coordinate-sheet merge (coordinate_handling/coordinate_assign_1.py:
  * 38-69, J15): an Excel/CSV coordinate submission upserts lat/long/
  * protected_coords/exclude/township/range/section into samples on the
  * composite key (sample_name, ccgp_project_id); submitted rows with no
  * matching sample are reported (the reference's "no metadata" print). */
object CoordinateUpdate {

  val CoordCols = Seq("lat", "long", "protected_coords", "exclude",
    "township", "range", "section")

  /** Returns (updatedSamples, unmatchedCoordRows). */
  def apply(samples: DataFrame, coords: DataFrame): (DataFrame, DataFrame) = {
    val keys = Seq("sample_name", "ccgp_project_id")
    // TRUE/FALSE strings normalized upper (coordinate_assign_1.py:40-43)
    val normalized = coords
      .withColumn("protected_coords", upper(col("protected_coords").cast("string")))
      .withColumn("exclude", upper(col("exclude").cast("string")))
    val unmatched = normalized.join(samples, keys, "left_anti")
    // only rows that match an existing sample are applied (the reference
    // iterates samples found by the composite filter)
    val applicable = normalized.join(samples.select(keys.map(col): _*), keys, "left_semi")
    val updated = Upsert.merge(samples, applicable, keys)
    (updated, unmatched)
  }
}
