package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame

/** Sinks S9/S13 (SURVEY §2.1): artifact TSV/CSV writers and the atomic
  * parquet swap the merge sinks rely on.
  *
  * The reference writes one flat file per artifact (create_sheets.py:
  * 114-119,159-161); `single=true` coalesces to one part — correct for
  * dashboard/submission artifacts, intentionally NOT the default for
  * data-scale tables. */
object Sinks {

  /** S9 — delimited artifact write (header, custom sep). Returns the
    * final file path when single=true. */
  def writeDelimited(df: DataFrame, path: String, sep: String = "\t",
      single: Boolean = true): Unit = {
    val out = if (single) df.coalesce(1) else df
    out.write.mode("overwrite")
      .option("sep", sep).option("header", "true")
      .csv(path)
  }

  /** Atomic table swap: write to `<path>.tmp`, then rename over `path`.
    * Readers never observe a half-written table (the reference's
    * bulk_write atomicity analogue for file-backed tables). */
  def atomicParquetSwap(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val tmp = path + ".tmp"
    df.write.mode("overwrite").parquet(tmp)
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val dst = new Path(path)
    fs.delete(dst, true)
    if (!fs.rename(new Path(tmp), dst))
      throw new java.io.IOException(s"atomic swap rename failed: $tmp -> $path")
  }

  /** Read-back helper for swap-managed tables; empty frame with the
    * given schema when the table doesn't exist yet. */
  def readOrEmpty(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(path))) spark.read.parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }
}
