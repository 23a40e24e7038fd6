package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.CleaningFunctions

/** Depth/variance report (variance_files.py:60-175,
  * variance_sheets_new.py:104-165): per-sample expected reads/depth from
  * filesize, genome size from a dimension with an "NA"-sentinel fallback
  * column (J10), per-project roll-up with the <5×/<8× QC counters.
  *
  * Sentinel semantics preserved relationally: no filesize → null reads
  * ("No filesize recorded."), no genome size → null depth; the project
  * average is `pd.to_numeric(errors='coerce').mean()` = avg over the
  * non-null depths.
  */
object VarianceReport {

  /** J10 — genome-size lookup with fallback column: primary unless "NA",
    * else the fallback estimate. */
  def resolveGenomeSize(genomeSizes: DataFrame): DataFrame =
    genomeSizes.select(col("project_id"),
      coalesce(nullif(col("size"), lit("NA")), col("fallback_size"))
        .try_cast("double").as("genome_size"))

  /** Per-sample depth frame: (sample_name, project, expected_reads,
    * expected_depth) with sentinel-null semantics. */
  def perSample(samples: DataFrame, genomeSizes: DataFrame): DataFrame = {
    val sized = samples
      .join(broadcast(resolveGenomeSize(genomeSizes)),
        samples("ccgp_project_id") === col("project_id"), "left")
    sized.select(
      col("sample_name"), col("ccgp_project_id"),
      when(col("filesize_sum") >= 0,
        CleaningFunctions.expectedReads(col("filesize_sum"))).as("expected_reads"),
      when(col("filesize_sum") >= 0 && col("genome_size").isNotNull,
        CleaningFunctions.depth(
          CleaningFunctions.expectedReads(col("filesize_sum")),
          col("genome_size"))).as("expected_depth"))
  }

  /** Per-project roll-up (variance_sheets_new.py:104-165): average depth
    * over numeric rows, <5× and <8× counters, samples_used (filesize>0),
    * samples_considered. */
  def perProject(samples: DataFrame, genomeSizes: DataFrame): DataFrame =
    perSample(samples, genomeSizes)
      .join(samples.select(col("sample_name"), col("filesize_sum")), Seq("sample_name"))
      .groupBy(col("ccgp_project_id"))
      .agg(
        round(avg(col("expected_depth")), 3).as("project_avg_depth"),
        count(when(col("expected_depth") < 5, 1)).as("n_below_5x"),
        count(when(col("expected_depth") < 8, 1)).as("n_below_8x"),
        count(when(col("filesize_sum") > 0, 1)).as("samples_used"),
        count(lit(1)).as("samples_considered"))
      .orderBy(col("ccgp_project_id"))
}
