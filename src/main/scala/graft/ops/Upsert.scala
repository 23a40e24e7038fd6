package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed merge/upsert without a table format — SURVEY.md §4.3.4.
  *
  * Reproduces the reference's four MongoDB update verbs
  * (`/root/reference/update_metadata.py:71-77` `$set`,
  * `/root/reference/update_reads.py:46-56` `$setOnInsert`,
  * `/root/reference/update_reads.py:258-273` `$addToSet $each`,
  * `/root/reference/update_reads.py:190-193` `$pull`) as one composable
  * relational operation: a full-outer join on the key columns with a
  * per-column conflict policy.
  *
  * Scale: one shuffle on the key (or zero if both sides are already
  * co-partitioned/bucketed by the key); policies are narrow expressions.
  * Idempotent: merge(merge(t,u),u) == merge(t,u) for every policy
  * (property-tested in UpsertSpec).
  */
object Upsert {

  sealed trait Policy
  /** Mongo `$set`: update wins where present (null update keeps target). */
  case object Set extends Policy
  /** Mongo `$setOnInsert`: only fills rows that don't exist in target. */
  case object SetOnInsert extends Policy
  /** Mongo `$addToSet {$each: [...]}`: array union with dedup. */
  case object AddToSet extends Policy
  /** Mongo `$pull {$in: values}`: remove matching elements from target array. */
  final case class PullValues(values: Seq[String]) extends Policy

  /** Merge `updates` into `target` on `keys`.
    *
    * Column resolution: key columns are coalesced across sides; columns in
    * both sides get their `policies` entry (default [[Set]]); columns in
    * only one side pass through. Row semantics: full outer — target rows
    * with no update survive, update rows with no target row are inserts.
    */
  def merge(
      target: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      policies: Map[String, Policy] = Map.empty): DataFrame = {

    val t = target.alias("t")
    val u = updates.alias("u")
    val joined = t.join(u, keys, "full_outer")

    val tCols = target.columns.toSet
    val uCols = updates.columns.toSet
    // "row exists in updates" marker: any key present on u-side.
    // With USING-join the key is coalesced, so derive existence from a
    // non-key u column if one exists, else treat every row as matched.
    val out: Seq[Column] =
      keys.map(k => col(k)) ++
        (target.columns ++ updates.columns).distinct
          .filterNot(keys.contains)
          .map { c =>
            val inT = tCols.contains(c)
            val inU = uCols.contains(c)
            val expr =
              if (inT && inU) policies.getOrElse(c, Set) match {
                case Set         => coalesce(col(s"u.$c"), col(s"t.$c"))
                case SetOnInsert => coalesce(col(s"t.$c"), col(s"u.$c"))
                case AddToSet =>
                  array_distinct(
                    when(col(s"t.$c").isNull, col(s"u.$c"))
                      .when(col(s"u.$c").isNull, col(s"t.$c"))
                      .otherwise(concat(col(s"t.$c"), col(s"u.$c"))))
                case p: PullValues =>
                  // Pull is target-side cleanup; updates side ignored.
                  pull(col(s"t.$c"), p.values)
              }
              else if (inT) policies.get(c) match {
                case scala.Some(PullValues(vs)) => pull(col(s"t.$c"), vs)
                case _                          => col(s"t.$c")
              }
              else col(s"u.$c")
            expr.as(c)
          }
    joined.select(out: _*)
  }

  /** `$pull {$in: values}` on an array column. */
  def pull(arr: Column, values: Seq[String]): Column =
    filter(arr, x => !x.isin(values: _*))

  /** Delete-by-key (S12, delete_mongo_file_if_not_in_aws.py:34):
    * remove target rows whose key appears in `victims`. */
  def delete(target: DataFrame, victims: DataFrame, keys: Seq[String]): DataFrame =
    target.join(victims.select(keys.map(col): _*).distinct(), keys, "left_anti")
}
