package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity release with a generalization ladder (Sweeney 2002;
  * Mondrian-style level ladders, LeFevre ICDE'06) — the privacy gate a
  * training-data release pipeline runs before user-derived metadata
  * leaves the boundary: every released row's quasi-identifier (QI)
  * combination must be shared by ≥ k rows. Rather than suppressing
  * every small group outright, each row takes the FIRST ladder level
  * (most specific first) at which its generalized QI group reaches k;
  * rows safe at no level are suppressed (`gen_level = -1`, every QI
  * masked to `*`).
  *
  * `levels` is the ladder: each entry maps the SAME QI output names to
  * progressively coarser expressions (e.g. exact size bucket → decade
  * bucket → column dropped to `*`). QI values are compared as strings
  * with nulls coalesced to `∅` — a null QI is a value class of its own
  * (two null-lang rows ARE the same lang for re-identification), and
  * the sentinel keeps them joinable where a raw null key would silently
  * drop the row from its own group count.
  *
  * Scale shape: one wide projection computes every level's QI in a
  * single scan; each level's group census is ONE map-side-combined
  * aggregate whose result is |distinct QI_level| rows — by construction
  * orders of magnitude smaller than the data — and joins back
  * BROADCAST, so the fact table itself never shuffles: at any corpus
  * size the full-data cost is one scan plus L broadcast hash joins.
  * The level choice and masking are then narrow CASE chains.
  */
object Anonymize {

  def kAnonymity(df: DataFrame, keyCol: String,
      levels: Seq[Seq[(String, Column)]], k: Long): DataFrame = {
    require(levels.nonEmpty, "need at least one generalization level")
    require(k >= 1, s"k must be >= 1, got $k")
    val qiNames = levels.head.map(_._1)
    require(levels.forall(_.map(_._1) == qiNames),
      "every level must name the same QI columns in the same order")

    val withQi = df.select(
      col(keyCol) +: levels.zipWithIndex.flatMap { case (lv, i) =>
        lv.map { case (n, c) =>
          coalesce(c.cast("string"), lit("∅")).as(s"_${n}_$i")
        }
      }: _*)

    var cur = withQi
    levels.indices.foreach { i =>
      val cols = qiNames.map(n => s"_${n}_$i")
      val counts = withQi.groupBy(cols.map(col): _*)
        .agg(count(lit(1)).as(s"_n_$i"))
      cur = cur.join(broadcast(counts), cols)
    }
    // first (most specific) level whose group reaches k, else suppressed
    val level = levels.indices.foldRight(lit(-1L): Column) { case (i, els) =>
      when(col(s"_n_$i") >= k, lit(i.toLong)).otherwise(els)
    }
    val leveled = cur.withColumn("gen_level", level)
    val qiCols = qiNames.map { n =>
      levels.indices.foldRight(lit("*"): Column) { case (i, els) =>
        when(col("gen_level") === i, col(s"_${n}_$i")).otherwise(els)
      }.as(s"gen_$n")
    }
    leveled.select(col(keyCol) +: qiCols :+ col("gen_level"): _*)
  }

  /** l-diversity audit of a released table (Machanavajjhala et al.
    * ICDE'06): k-anonymity bounds group SIZE but a group whose
    * sensitive attribute is constant still leaks it — this reports,
    * per quasi-identifier group, the row count, the number of DISTINCT
    * sensitive values, and whether it reaches `l`. A null sensitive
    * value is one value class of its own (GROUP BY null semantics,
    * identical in both engines).
    *
    * Scale shape: a two-level aggregate — (QI, sensitive) counts first
    * (map-side combined; avoids countDistinct's Expand over the raw
    * release), then the per-QI rollup over the already-tiny distinct
    * grid. */
  def lDiversity(released: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty && l >= 1, "need QI columns and l >= 1")
    released
      .groupBy((quasiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("_n"))
      .groupBy(quasiCols.map(col): _*)
      .agg(sum(col("_n")).as("n_rows"), count(lit(1)).as("n_distinct"))
      .withColumn("l_ok", col("n_distinct") >= l)
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian ICDE'07) of a
    * released table over an ORDERED sensitive attribute: per QI group,
    * the Earth Mover's Distance between the group's distribution of
    * `orderedCol` and the whole release's, in exact basis points —
    * l-diversity counts distinct values but a group can still skew
    * (all its values at one end); EMD is the leak check for that.
    *
    * For ordered values with m distinct levels, EMD is the mean
    * absolute cumulative-share gap: Σᵢ|cumP(i) − cumQ(i)| / (m−1).
    * Cross-multiplied to integers — with group size gₙ, release size
    * N, cumulative counts cum_c (group) and cum_C (global):
    * t_bp = ⌊10⁴·Σᵢ|cum_c·N − cum_C·gₙ| ∕ ((m−1)·gₙ·N)⌋, exact in
    * decimal(38,0) at any scale (the numerator is ≤ m·gₙ·N·10⁴).
    *
    * Scale shape: the level census and the per-(group, level) counts
    * are map-side-combined aggregates; the (group × level) grid —
    * |groups|·m rows by construction, data-size-independent — is a
    * broadcast cross join so every group has a dense cumulative walk
    * (a missing level still moves earth); the cumulative window
    * partitions by group. The fact table never shuffles. */
  def tCloseness(released: DataFrame, quasiCols: Seq[String],
      orderedCol: String, tBp: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need QI columns")
    val qi = quasiCols.map(col)
    val levels = released.groupBy(col(orderedCol).as("_lv"))
      .agg(count(lit(1)).as("_cg"))
    val groups = released.groupBy(qi: _*).agg(count(lit(1)).as("n_rows"))
    val cells = released.groupBy(qi :+ col(orderedCol).as("_lv"): _*)
      .agg(count(lit(1)).as("_c"))
    // null-SAFE join back onto the grid: groupBy forms a group for null
    // QI values and a level row for a null sensitive value, but a plain
    // equi join (null != null) would drop those cells — their rows would
    // vanish from the cumulative walk while still counted in n_rows/N,
    // skewing t_bp on nullable inputs. A null level sorts FIRST in the
    // cumulative order (asc_nulls_first) and counts as a level of its own.
    val grid0 = groups.crossJoin(broadcast(levels))
    val joinCond = (quasiCols.map(n => grid0(n) <=> cells(n)) :+
      (grid0("_lv") <=> cells("_lv"))).reduce(_ && _)
    val grid = grid0.join(cells, joinCond, "left")
      .select(grid0.columns.map(grid0(_)) :+ cells("_c"): _*)
      .withColumn("_c", coalesce(col("_c"), lit(0L)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qi: _*).orderBy(col("_lv").asc_nulls_first)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val totals = released.agg(count(lit(1)).as("_nn"),
      (count_distinct(col(orderedCol)) +
        max(when(col(orderedCol).isNull, 1L).otherwise(0L))).as("_m"))
    grid
      .withColumn("_cum_c", sum(col("_c")).over(w).cast("decimal(38,0)"))
      .withColumn("_cum_cg", sum(col("_cg")).over(w).cast("decimal(38,0)"))
      .crossJoin(broadcast(totals))
      .groupBy(qi :+ col("n_rows") :+ col("_nn") :+ col("_m"): _*)
      .agg(sum(abs(col("_cum_c") * col("_nn") -
        col("_cum_cg") * col("n_rows"))).as("_emd_num"))
      .select(qi :+ col("n_rows") :+
        expr(s"""(10000 * _emd_num)
                 div (cast(greatest(_m - 1, 1) as decimal(38,0)) *
                      cast(n_rows as decimal(38,0)) *
                      cast(_nn as decimal(38,0)))""")
          .cast("long").as("t_bp"): _*)
      .withColumn("t_ok", col("t_bp") <= tBp)
  }
}
