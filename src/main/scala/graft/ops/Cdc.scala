package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC apply-changes — materialize the LATEST STATE of a keyed entity
  * table from an ordered change stream (op = upsert | delete): the
  * "APPLY CHANGES INTO" half of every CDC pipeline, next to
  * [[Scd2.merge]] (which keeps the history; this keeps the now).
  *
  * The winner per key is ONE `max(struct(seq…, op, payload…))`
  * aggregate — associative/commutative and map-side combinable, so raw
  * change volume collapses inside each input partition before the
  * single key shuffle (the Resample last-observation-wins pattern); a
  * row_number window over the raw stream would ship EVERY change to
  * the reducers. A delete wins like any other change and then drops
  * its key from the output (tombstone applied, not retained).
  * `seqCols` must totally order each key's changes (put a unique tie
  * column last); payload/op columns after the tie never influence the
  * comparison.
  */
object Cdc {

  /** NET-EFFECT compaction of a change log between two checkpoints —
    * the change-feed minimizer: many ops per key collapse to the one
    * op a downstream consumer must replay. Classification from the
    * key's FIRST and LAST op in `seqCol` order:
    * insert+…+delete → `none` (born and died inside the window),
    * insert+… → `insert` (with the final payload), …+delete →
    * `delete`, anything else → `update`. Rows classified `none` are
    * RETURNED (callers filter) so the compactor is auditable.
    *
    * `final_val` is the payload of the key's last NON-delete op — a
    * tombstone carries no payload, so ranking it like any other change
    * would return the delete row's (typically null) value for every
    * delete-/none-classified key. Keys whose ops are all deletes get a
    * null `final_val`. (max_by skips rows whose ordering expression is
    * null, so masking the delete rows' seq keeps the aggregate one
    * map-side-combinable pass.)
    *
    * One map-side-combinable aggregate per key (min_by/max_by over the
    * sequence — never a window over the raw log); `seqCol` must
    * totally order each key's ops. */
  def compact(log: DataFrame, keyCol: String, seqCol: String,
      opCol: String, valCol: String): DataFrame =
    log.groupBy(col(keyCol))
      .agg(min_by(col(opCol), col(seqCol)).as("_first"),
        max_by(col(opCol), col(seqCol)).as("_last"),
        max_by(col(valCol),
          when(col(opCol) =!= "D", col(seqCol))).as("final_val"),
        count(lit(1)).as("n_ops"))
      .withColumn("net_op",
        when(col("_first") === "I" && col("_last") === "D", "none")
          .when(col("_first") === "I", "insert")
          .when(col("_last") === "D", "delete")
          .otherwise("update"))
      .select(col(keyCol), col("net_op"), col("final_val"), col("n_ops"))

  def applyChanges(changes: DataFrame, keyCols: Seq[String],
      seqCols: Seq[String], opCol: String, payloadCols: Seq[String],
      deleteOp: String = "delete"): DataFrame = {
    require(keyCols.nonEmpty && seqCols.nonEmpty && payloadCols.nonEmpty,
      "applyChanges needs key, sequence, and payload columns")
    val winner = changes.groupBy(keyCols.map(col): _*)
      .agg(
        max(struct((seqCols ++ (opCol +: payloadCols)).map(col): _*)).as("_w"),
        count(lit(1)).as("n_changes"))
    winner.where(col(s"_w.$opCol") =!= deleteOp)
      .select(keyCols.map(col) ++
        payloadCols.map(c => col(s"_w.$c").as(c)) :+ col("n_changes"): _*)
  }
}
