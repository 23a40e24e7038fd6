package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ext.ColInterpolator

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

  /** Functional-dependency / candidate-key check — the dependency layer
    * of profiling ([[profile]] gives per-column stats; this answers "is
    * X a key" / "does X determine Y", the assumptions every dedup key,
    * SCD2 merge, and dimension join silently makes). A rule
    * (name, determinant cols, dependent cols) HOLDS when every
    * determinant group maps to exactly one distinct dependent tuple; a
    * key check is a rule whose dependent is the rest of the row (or a
    * rule against a count: every group of size 1).
    *
    * Output per rule: groups, violating groups (> 1 distinct dependent
    * tuple), rows inside violating groups, and the verdict.
    *
    * Scale shape: ONE hash aggregate per rule on the determinant —
    * distinct dependents counted EXACTLY via a two-level (det, dep)
    * pre-aggregate (map-side combined; never countDistinct's Expand
    * blow-up on the raw table), then a rule-level rollup of counters.
    * Nulls: a null dependent is a value class (two nulls agree); null
    * determinants form their own group — both via first-class struct
    * grouping, no sentinels needed. */
  def fdCheck(df: DataFrame,
      rules: Seq[(String, Seq[String], Seq[String])]): DataFrame = {
    require(rules.nonEmpty, "fdCheck needs at least one rule")
    rules.map { case (name, det, dep) =>
      require(det.nonEmpty && dep.nonEmpty, s"rule $name needs columns")
      val pairs = df
        .select(struct(det.map(col): _*).as("_det"),
          struct(dep.map(col): _*).as("_dep"))
        .groupBy($"_det", $"_dep").agg(count(lit(1)).as("_n"))
      val groups = pairs.groupBy($"_det")
        .agg(count(lit(1)).as("_nd"), sum($"_n").as("_rows"))
      groups.agg(
          count(lit(1)).as("n_groups"),
          coalesce(sum(when($"_nd" > 1, 1L).otherwise(0L)), lit(0L))
            .as("n_viol_groups"),
          coalesce(sum(when($"_nd" > 1, $"_rows").otherwise(0L)), lit(0L))
            .as("n_viol_rows"))
        .select(lit(name).as("rule"), $"n_groups", $"n_viol_groups",
          $"n_viol_rows", ($"n_viol_groups" === 0L).as("holds"))
    }.reduce(_ unionByName _)
  }
}
