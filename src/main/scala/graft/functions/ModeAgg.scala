package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Deterministic string mode aggregate (custom UDAF surface, SURVEY §2.9).
  *
  * The reference computes a per-project mode with `pd.Series.mode(...)[0]`
  * (`/root/reference/utils/parse.py:319`) whose tie-break is pandas' sort
  * order; we pin the same deterministic semantics: most frequent value,
  * ties broken by the smallest value. Nulls are ignored; empty group -> null.
  *
  * Spark 4 has a built-in `mode()`, but its tie-break is non-deterministic
  * unless asked otherwise; a custom [[Aggregator]] also ticks the engine's
  * "custom UDAF" box. The buffer is a small value->count map, merged
  * map-side (partial aggregation), so the shuffle carries only distinct
  * values per group — scale-safe for low-cardinality mode targets.
  */
object ModeAgg extends Aggregator[String, Map[String, Long], String] {
  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    if (a == null) b else b.updated(a, b.getOrElse(a, 0L) + 1L)

  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    val (small, large) = if (b1.size < b2.size) (b1, b2) else (b2, b1)
    small.foldLeft(large) { case (acc, (k, v)) => acc.updated(k, acc.getOrElse(k, 0L) + v) }
  }

  override def finish(b: Map[String, Long]): String =
    if (b.isEmpty) null
    else b.minBy { case (v, c) => (-c, v) }._1

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[String] = Encoders.STRING

  private lazy val fn = udaf(ModeAgg, Encoders.STRING)

  /** Column-level entry point: `mode_str($"c_mktsegment")`. */
  def mode_str(c: Column): Column = fn(c)
}
