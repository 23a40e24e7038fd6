package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.ModeAgg

/** The reference's flagship dashboard aggregation (SURVEY §2.4 A1,
  * parse.py:294-340 consumed by update_gsheet.py): one row per project.
  *
  * Columns mirror the reference: Metadata received, # has reads,
  * # unexpected species, Tb, Reference Stage, Expected #, % Done,
  * Project Type (mode), Samples missing data — sorted by % Done desc.
  *
  * Scale: single hash aggregation over samples (pre-shrunk by column
  * pruning) + two broadcast dims; `collect_list` is bounded per project.
  */
object UpdateDashboard {

  def summary(samples: DataFrame,
      referenceProgress: DataFrame,  // (project_id, stage)
      expectedCounts: DataFrame      // (project_id, n_expected)
  ): DataFrame = {
    val hasFiles = col("files").isNotNull && size(col("files")) > 0
    val agg = samples
      .withColumnRenamed("*sample_name", "sample_name")
      .groupBy(col("ccgp_project_id"))
      .agg(
        count(lit(1)).as("metadata_received"),
        count(when(hasFiles, 1)).as("has_reads"),
        (count(lit(1)) - sum(coalesce(col("expected_species"), lit(0)))).as("unexpected_species"),
        round(sum(coalesce(col("filesize_sum"), lit(0L))) / 1e12, 6).as("filesize_tb"),
        ModeAgg.mode_str(col("project_type")).as("project_type"),
        sort_array(collect_list(when(!hasFiles, col("sample_name")))).as("samples_missing_data"))

    agg
      .join(broadcast(referenceProgress
          .select(col("project_id"), col("stage").as("reference_stage"))),
        col("ccgp_project_id") === col("project_id"), "left")
      .drop("project_id")
      .join(broadcast(expectedCounts
          .select(col("project_id"), col("n_expected"))),
        col("ccgp_project_id") === col("project_id"), "left")
      .drop("project_id")
      .withColumn("pct_done",
        round(col("has_reads") / col("n_expected"), 6))
      .orderBy(desc_nulls_last("pct_done"), col("ccgp_project_id"))
  }
}
