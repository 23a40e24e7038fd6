package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — "the latest right row at or before each left row's
  * timestamp, per key" — the time-series join Spark has no native
  * operator for (DuckDB, pandas `merge_asof`, and kdb all do).
  *
  * Formulation: union both sides, then one `last(_, ignoreNulls)`
  * window carry-forward. That is the scale-correct shape:
  *
  *  - ONE shuffle on the key (both sides co-partition), then a linear
  *    per-partition scan — no range-condition join. A naive
  *    `l.ts >= r.ts` inequality join explodes to O(|L|·|R|) pairs per
  *    key before its top-1 filter; the union form never materializes a
  *    candidate pair at all.
  *  - No driver involvement, no broadcast requirement: both sides can
  *    be 100 TB; skew follows the key distribution exactly like any
  *    keyed window.
  *
  * Semantics (backward as-of, the standard default):
  *  - a right row with `r.ts == l.ts` DOES match (right sorts before
  *    left at equal timestamps);
  *  - left rows with no prior right row keep null match columns
  *    (LEFT-outer flavor);
  *  - right rows with a null key are dropped first — a relational
  *    equi-join never matches nulls, and the union formulation would
  *    otherwise group them with null-keyed left rows;
  *  - several right rows at the SAME (key, ts) resolve to the greatest
  *    payload struct (documented determinism for degenerate feeds —
  *    real feeds key uniquely on (key, ts)).
  */
object AsofJoin {

  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, rightPrefix: String = "r_"): DataFrame = {
    require(keys.nonEmpty, "asof join needs at least one key column")
    val rPayload = right.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq
    val rStruct = struct((col(tsCol).as(tsCol) +: rPayload.map(c => col(c).as(c))): _*)
    val rTagged = right
      .where(keys.map(col(_).isNotNull).reduce(_ && _))
      .select(keys.map(col) ++ Seq(col(tsCol).as("_ts"), rStruct.as("_r")): _*)
      .withColumn("_side", lit(0))
    val lCols = left.columns.toSeq
    val lTagged = left
      .select(keys.map(col) ++ Seq(col(tsCol).as("_ts"),
        struct(lCols.map(col): _*).as("_l")): _*)
      .withColumn("_side", lit(1))
    val unioned = lTagged
      .withColumn("_r", lit(null).cast(rTagged.schema("_r").dataType))
      .unionByName(rTagged
        .withColumn("_l", lit(null).cast(lTagged.schema("_l").dataType)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_side"), col("_r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(lCols.map(c => col("_l").getField(c).as(c)) ++
        (tsCol +: rPayload).map(c =>
          col("_match").getField(c).as(rightPrefix + c)): _*)
  }

  /** FORWARD as-of join: for each left row, the EARLIEST right row at
    * or after its timestamp, per key — "next event" semantics (the
    * next purchase after a signup, the next quote after an order).
    * Mirror of [[asofBackward]]: same union + one keyed window, no
    * join operator, one shuffle; here the carry runs FORWARD via
    * `first(_, ignoreNulls)` over [current, unbounded following].
    *
    * Semantics mirror backward's: an equal-timestamp right row DOES
    * match (right sorts after left at equal ts in this orientation),
    * left rows with no later right row keep null match columns,
    * null-keyed right rows are dropped, and several right rows at the
    * same (key, ts) resolve to the greatest payload struct. */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, rightPrefix: String = "r_"): DataFrame = {
    require(keys.nonEmpty, "asof join needs at least one key column")
    val rPayload = right.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq
    val rStruct = struct((col(tsCol).as(tsCol) +: rPayload.map(c => col(c).as(c))): _*)
    val rTagged = right
      .where(keys.map(col(_).isNotNull).reduce(_ && _))
      .select(keys.map(col) ++ Seq(col(tsCol).as("_ts"), rStruct.as("_r")): _*)
      .withColumn("_side", lit(0))
    val lCols = left.columns.toSeq
    val lTagged = left
      .select(keys.map(col) ++ Seq(col(tsCol).as("_ts"),
        struct(lCols.map(col): _*).as("_l")): _*)
      .withColumn("_side", lit(1))
    val unioned = lTagged
      .withColumn("_r", lit(null).cast(rTagged.schema("_r").dataType))
      .unionByName(rTagged
        .withColumn("_l", lit(null).cast(lTagged.schema("_l").dataType)))
    // left (_side=1) sorts BEFORE right (_side=0) at equal ts, so the
    // forward-looking window from a left row includes equal-ts matches;
    // _r descending makes `first` pick the greatest payload on (key, ts)
    // ties — the same determinism rule as backward's `last` + ascending
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_side").desc, col("_r").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    unioned
      .withColumn("_match", first(col("_r"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(lCols.map(c => col("_l").getField(c).as(c)) ++
        (tsCol +: rPayload).map(c =>
          col("_match").getField(c).as(rightPrefix + c)): _*)
  }

  /** NEAREST as-of join: for each left row, the right row minimizing
    * |r.ts − l.ts| within ±`maxGapSeconds`, per key — sensor/series
    * alignment where "latest before" is the wrong bias. Same union +
    * window formulation as [[asofBackward]], still ONE keyed shuffle
    * and zero join operators: the one sorted pass carries BOTH the
    * trailing `last(ignoreNulls)` (previous right row) and the leading
    * `first(ignoreNulls)` (next right row) over the same partitioning,
    * then each left row picks the nearer candidate (ties → the earlier
    * one, the merge_asof convention). Candidates beyond the gap are
    * nulled — a bounded tolerance is what keeps "nearest" meaningful
    * on sparse feeds.
    *
    * Equal timestamps match exactly (distance 0 beats any other); the
    * right-row ordering/null-key rules of [[asofBackward]] carry over. */
  def asofNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, maxGapSeconds: Long,
      rightPrefix: String = "r_"): DataFrame = {
    require(keys.nonEmpty, "asof join needs at least one key column")
    require(maxGapSeconds >= 0, s"maxGapSeconds must be >= 0, got $maxGapSeconds")
    // the gap math runs through unix_micros(cast(.. AS TIMESTAMP)):
    // a no-op for TIMESTAMP, the session-zone pin for TIMESTAMP_NTZ —
    // any other type must fail here, not silently reinterpret
    locally {
      import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
      val tsDt = right.schema(tsCol).dataType
      require(tsDt == TimestampType || tsDt == TimestampNTZType,
        s"asofNearest ts column must be TIMESTAMP/TIMESTAMP_NTZ, got $tsDt ($tsCol)")
    }
    val rPayload = right.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq
    val rStruct = struct((col(tsCol).as(tsCol) +: rPayload.map(c => col(c).as(c))): _*)
    val rTagged = right
      .where(keys.map(col(_).isNotNull).reduce(_ && _))
      .select(keys.map(col) ++ Seq(col(tsCol).as("_ts"), rStruct.as("_r")): _*)
      .withColumn("_side", lit(0))
    val lCols = left.columns.toSeq
    val lTagged = left
      .select(keys.map(col) ++ Seq(col(tsCol).as("_ts"),
        struct(lCols.map(col): _*).as("_l")): _*)
      .withColumn("_side", lit(1))
    val unioned = lTagged
      .withColumn("_r", lit(null).cast(rTagged.schema("_r").dataType))
      .unionByName(rTagged
        .withColumn("_l", lit(null).cast(lTagged.schema("_l").dataType)))
    val ord = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_side"), col("_r"))
    val wPrev = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    def gapOk(c: org.apache.spark.sql.Column) =
      abs(unix_micros(c.getField(tsCol).cast("timestamp")) -
        unix_micros(col("_ts").cast("timestamp"))) <=
        maxGapSeconds * 1000000L
    val picked = unioned
      .withColumn("_prev", last(col("_r"), ignoreNulls = true).over(wPrev))
      .withColumn("_next", first(col("_r"), ignoreNulls = true).over(wNext))
      .where(col("_side") === 1)
      .withColumn("_pOk", col("_prev").isNotNull && gapOk(col("_prev")))
      .withColumn("_nOk", col("_next").isNotNull && gapOk(col("_next")))
      .withColumn("_match",
        when(col("_pOk") && (!col("_nOk") ||
          unix_micros(col("_ts").cast("timestamp")) -
            unix_micros(col("_prev").getField(tsCol).cast("timestamp")) <=
            unix_micros(col("_next").getField(tsCol).cast("timestamp")) -
            unix_micros(col("_ts").cast("timestamp"))),
          col("_prev"))
          .when(col("_nOk"), col("_next")))
    picked.select(lCols.map(c => col("_l").getField(c).as(c)) ++
      (tsCol +: rPayload).map(c =>
        col("_match").getField(c).as(rightPrefix + c)): _*)
  }
}
