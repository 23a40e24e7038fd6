package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ANALYZE-style table profiling: one pass over the table → one row per
  * column with (rows, nulls, distinct, min, max) — the stats that feed
  * CBO join ordering, broadcast decisions, and data-quality gates.
  *
  * Everything rides ONE aggregate: per-column non-null/ndv/min/max
  * plus the row count, then a literal-array explode pivots the single
  * wide row to long format (driver-free, no second scan). Exact
  * `countDistinct` is deliberate — the oracle must agree bit-for-bit;
  * Spark plans the multi-distinct with one Expand (a documented
  * ×columns blow-up of the scan, the standard price of exact multi-NDV;
  * swap `approx_count_distinct` at 100 TB when ±2 % is acceptable).
  * Min/max stringify AFTER aggregating in the native type, so numeric
  * and date ordering is preserved (a string-typed min would sort
  * lexicographically). */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] = cols.flatMap(c => Seq(
      count(col(c)).as(s"${c}__cnt"),
      countDistinct(col(c)).as(s"${c}__ndv"),
      min(col(c)).cast("string").as(s"${c}__min"),
      max(col(c)).cast("string").as(s"${c}__max"))) :+
      count(lit(1)).as("__n")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    wide.select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"${c}__cnt")).as("n_nulls"),
        col(s"${c}__ndv").as("n_distinct"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value"))): _*)).as("s"))
      .select("s.*")
  }

  def profile(df: DataFrame): DataFrame = profile(df, df.columns.toSeq)
}
