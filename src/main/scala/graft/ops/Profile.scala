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

  /** Functional-dependency DISCOVERY over a column set: every directed
    * pair (det → dep) of `cols` profiled in ONE scan — the exploratory
    * complement of [[fdCheck]]'s declared rules, whose per-rule
    * aggregates would cost |pairs| passes over the table. The melt
    * (one struct per pair, exploded) multiplies rows by |cols|·(|cols|−1)
    * BEFORE the map-side combine collapses them to the (pair, det-value,
    * dep-value) grid, so the full-data cost is one scan plus an
    * aggregate over the distinct grid.
    *
    * Values are compared as STRINGS with nulls coalesced to `∅` (one
    * struct type must host every column; a null is one value class,
    * the kAnonymity convention) — use string/integer columns, where
    * the rendering is canonical. */
  def fdDiscover(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns to discover FDs")
    val pairs = for (a <- cols; b <- cols if a != b) yield (a, b)
    val melted = df.select(explode(array(pairs.map { case (a, b) =>
      struct(lit(a).as("det_col"), lit(b).as("dep_col"),
        coalesce(col(a).cast("string"), lit("∅")).as("dv"),
        coalesce(col(b).cast("string"), lit("∅")).as("pv"))
    }: _*)).as("_e"))
      .select($"_e.det_col", $"_e.dep_col", $"_e.dv", $"_e.pv")
    melted
      .groupBy($"det_col", $"dep_col", $"dv", $"pv")
      .agg(count(lit(1)).as("_n"))
      .groupBy($"det_col", $"dep_col", $"dv")
      .agg(count(lit(1)).as("_nd"), sum($"_n").as("_rows"))
      .groupBy($"det_col", $"dep_col")
      .agg(count(lit(1)).as("n_groups"),
        coalesce(sum(when($"_nd" > 1, 1L).otherwise(0L)), lit(0L))
          .as("n_viol_groups"),
        coalesce(sum(when($"_nd" > 1, $"_rows").otherwise(0L)), lit(0L))
          .as("n_viol_rows"))
      .withColumn("holds", $"n_viol_groups" === 0L)
  }

  /** Benford's-law expected first-digit shares, basis points of
    * ⌊10⁴·log₁₀(1 + 1∕d)⌋ — fixed literals so both engines compare
    * against the identical reference (no float log at query time). */
  val BenfordBp: Seq[Long] =
    Seq(3010L, 1760L, 1249L, 969L, 791L, 669L, 579L, 511L, 457L)

  /** Benford first-digit audit of a positive numeric column — the
    * fabricated-data / unit-mixing smoke test every financial or count
    * column should pass. The value is quantized to integer `cents =
    * ⌊100·x⌋` and the first digit extracted via the DECIMAL STRING
    * length (`d = cents div 10^(len−1)`) — pure integer arithmetic both
    * engines spell identically, no log₁₀ at the boundary values where
    * float `floor(log10(x))` flips early. Non-positive and null values
    * are excluded (Benford is defined on positive magnitudes); digits
    * with no observations emit n = 0 rows so the output is always 9
    * rows.
    *
    * Output per digit 1..9: observations, observed share (bp), the
    * Benford expectation (bp), and the signed deviation. One map-side
    * combined 9-group aggregate — scan-speed at any size. */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val cents = expr(s"cast(floor($valueCol * 100) as bigint)")
    val counts = df
      .where(col(valueCol).isNotNull && cents >= 1)
      .select(cents.as("_c"))
      .select(expr(
        "_c div cast(pow(10, length(cast(_c as string)) - 1) as bigint)")
        .as("digit"))
      .groupBy($"digit").agg(count(lit(1)).as("n"))
    val digits = BenfordBp.zipWithIndex
      .map { case (bp, i) => (i + 1L, bp) }.toDF("digit", "benford_bp")
    val tot = counts.agg(sum($"n").as("_t"))
    digits.join(counts, Seq("digit"), "left")
      .crossJoin(broadcast(tot))
      .select($"digit", coalesce($"n", lit(0L)).as("n"),
        expr("(10000 * coalesce(n, 0)) div _t").as("share_bp"),
        $"benford_bp")
      .withColumn("dev_bp", $"share_bp" - $"benford_bp")
  }
}
