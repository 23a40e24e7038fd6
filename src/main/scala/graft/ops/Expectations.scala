package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the dbt-test / Great
  * Expectations surface an ingest pipeline runs before publishing a
  * table: per-rule violation counts and a pass flag, as a small report
  * relation a done-marker or dashboard sink can ship.
  *
  * Scale shape: every predicate rule is a conditional sum inside ONE
  * aggregate over ONE scan — adding a rule adds a column, not a pass —
  * and the result is a single combined row exploded into per-rule rows
  * via the literal-array pivot (the [[Profile]] pattern). Uniqueness is
  * the one rule class that inherently needs its own key shuffle; its
  * group-by is map-side combined and its violation count is
  * `Σ (group_size − 1)` so the second aggregate sees one row per
  * distinct key, never the raw rows.
  */
object Expectations {

  /** One-pass predicate rules: each entry is (rule name, VIOLATION
    * predicate — true means the row breaks the rule). Returns one row
    * per rule: `(rule, n_rows, n_violations, pass)`. Null predicate
    * results count as violations (a rule that cannot evaluate on a row
    * should fail loudly, not vanish — the ingest-ledger philosophy). */
  def check(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      s"duplicate rule names in ${rules.map(_._1)}")
    val aggs = count(lit(1)).as("_n") +: rules.map { case (name, viol) =>
      sum(when(coalesce(viol, lit(true)), 1L).otherwise(0L)).as(s"_v_$name")
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rules.map { case (name, _) =>
        struct(lit(name).as("rule"), col("_n").as("n_rows"),
          col(s"_v_$name").as("n_violations"))
      }: _*)).as("_r"))
      .select(col("_r.rule").as("rule"), col("_r.n_rows").as("n_rows"),
        col("_r.n_violations").as("n_violations"),
        (col("_r.n_violations") === 0L).as("pass"))
  }

  /** Uniqueness expectation on a key column set: `n_violations` =
    * surplus rows beyond one per distinct key (0 iff the key is a
    * candidate key). Same output schema as [[check]] so reports union. */
  def checkUnique(df: DataFrame, keyCols: Seq[String],
      name: String = "unique"): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_c"))
      .agg(sum(col("_c")).as("n_rows"),
        sum(col("_c") - 1).as("n_violations"))
      .select(lit(name).as("rule"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        coalesce(col("n_violations"), lit(0L)).as("n_violations"),
        (coalesce(col("n_violations"), lit(0L)) === 0L).as("pass"))
  }
}
