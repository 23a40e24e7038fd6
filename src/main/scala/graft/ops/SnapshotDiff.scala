package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff (change-data-capture between two table versions):
  * classify every key as added / removed / changed, with old and new
  * values side by side — the reconciliation primitive behind audit
  * reports, incremental downstream refreshes, and "what did yesterday's
  * load actually do" debugging. One full outer join on the keys (one
  * shuffle), null-safe value comparison (null→value IS a change),
  * unchanged keys dropped before anything materializes. */
object SnapshotDiff {

  def diff(before: DataFrame, after: DataFrame,
      keys: Seq[String]): DataFrame = {
    val tracked = after.columns.filterNot(keys.contains).toSeq
    require(tracked.nonEmpty, "need at least one non-key column to diff")
    val b = before.select(keys.map(col) ++
      tracked.map(c => col(c).as(s"old_$c")) :+ lit(true).as("_in_b"): _*)
    val a = after.select(keys.map(col) ++
      tracked.map(c => col(c).as(s"new_$c")) :+ lit(true).as("_in_a"): _*)
    val j = b.join(a, keys, "full")
    val changed = tracked
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    j.withColumn("change_type",
        when(col("_in_b").isNull, lit("added"))
          .when(col("_in_a").isNull, lit("removed"))
          .when(changed, lit("changed")))
      .where(col("change_type").isNotNull)
      .select((keys.map(col) :+ col("change_type")) ++
        tracked.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }
}
