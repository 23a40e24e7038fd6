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
}
