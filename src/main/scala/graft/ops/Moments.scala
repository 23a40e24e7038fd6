package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped second-order statistics — Pearson correlation and simple OLS
  * (y = a + b·x) — computed from EXACT INTEGER co-moments: the five
  * sums Σx, Σy, Σxy, Σx², Σy² are long aggregates over integer-valued
  * inputs, so every partial is exact and the reduction is
  * order-independent (the cross-engine determinism contract; Spark's
  * own `corr` reduces doubles in partition order and is not
  * bit-reproducible). Only the FINAL formula touches floating point —
  * one fixed chain of IEEE ops per group that any engine replays
  * bit-for-bit.
  *
  * Inputs must be integer-valued and small enough that `n·Σv²` fits a
  * long (quantize/downscale first — the q-fixed-point discipline used
  * across the ext layer). Scale shape: ONE map-side-combined aggregate
  * over one scan; group cardinality rows move, never data. */
object Moments {

  /** Per-group `(n, corr_q6, slope_q6, intercept_q6)` of integer-valued
    * columns `xCol`, `yCol`. Degenerate groups (zero variance in x for
    * the fit, or in either variable for the correlation) yield nulls
    * rather than NaN-poisoning downstream. */
  def corrOls(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    def q6(c: Column): Column = floor(c * lit(1000000.0)).cast("long")
    df.where(col(groupCol).isNotNull && x.isNotNull && y.isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(x).as("_sx"), sum(y).as("_sy"),
        sum(x * y).as("_sxy"), sum(x * x).as("_sxx"), sum(y * y).as("_syy"))
      // covn = n·Σxy − Σx·Σy ; varxn = n·Σx² − (Σx)² ; varyn likewise —
      // all exact longs; the oracle spells the identical nesting
      .withColumn("_covn", col("n") * col("_sxy") - col("_sx") * col("_sy"))
      .withColumn("_varxn", col("n") * col("_sxx") - col("_sx") * col("_sx"))
      .withColumn("_varyn", col("n") * col("_syy") - col("_sy") * col("_sy"))
      .withColumn("corr_q6",
        when(col("_varxn") > 0 && col("_varyn") > 0,
          q6(col("_covn").cast("double") /
            sqrt(col("_varxn").cast("double") * col("_varyn").cast("double")))))
      .withColumn("slope_q6",
        when(col("_varxn") > 0,
          q6(col("_covn").cast("double") / col("_varxn").cast("double"))))
      .withColumn("intercept_q6",
        when(col("_varxn") > 0,
          q6((col("_sy").cast("double") -
            (col("_covn").cast("double") / col("_varxn").cast("double"))
              * col("_sx").cast("double")) / col("n").cast("double"))))
      .select(col(groupCol), col("n"), col("corr_q6"),
        col("slope_q6"), col("intercept_q6"))
  }
}
