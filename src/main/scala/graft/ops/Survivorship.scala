package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden-record survivorship — the MDM "latest non-null per FIELD"
  * merge rule. [[Cdc.applyChanges]] materializes the latest whole ROW;
  * here every field resolves independently, so a sparse update (one
  * field set, the rest missing) never clobbers an older real value of
  * the fields it didn't carry. The reference's `$set`-style partial
  * updates (`/root/reference/utils/db.py` upsert paths) have exactly
  * this semantics when several sources patch different columns of one
  * entity.
  */
object Survivorship {

  /** Latest non-null value per `(keyCols, fieldCol)` in long format:
    * one row per key+field that has EVER seen a non-null value,
    * carrying the winning value and its full order columns
    * (provenance: when and from which change it came).
    *
    * Scale shape: one map-side-combined `max(struct(orderCols, value))`
    * aggregate — change volume collapses to one partial per (key,
    * field) per input partition before the single key shuffle; a
    * window formulation would ship every change to the reducers.
    * `orderCols` must totally order changes within a key+field (e.g.
    * ts + a unique change id) or the winner is nondeterministic. */
  def goldenRecord(updates: DataFrame, keyCols: Seq[String], fieldCol: String,
      valueCol: String, orderCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty, "keys and order columns required")
    val winner = struct((orderCols :+ valueCol).map(col): _*)
    updates.where(col(valueCol).isNotNull)
      .groupBy((keyCols :+ fieldCol).map(col): _*)
      .agg(max(winner).as("_w"))
      .select((keyCols :+ fieldCol).map(col) ++
        (orderCols :+ valueCol).map(c => col(s"_w.$c").as(c)): _*)
  }
}
