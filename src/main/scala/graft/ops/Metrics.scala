package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Plan-economics probe: execute a DataFrame and read back how many
  * bytes its exchanges actually wrote to the shuffle. SQL metrics live
  * on the physical plan nodes after execution, so no listener (and no
  * race against the async listener bus) is needed.
  *
  * This is how the scale contracts in this library get MEASURED instead
  * of asserted-by-plan-shape: "the bounded top-k shuffles less than the
  * window formulation" is a number, not a story (MetricsSpec). Works on
  * non-adaptive plans — callers flip `spark.sql.adaptive.enabled` off
  * around the probe; AQE wraps exchanges in leaf query stages that hide
  * them from tree traversal. */
object Metrics {

  final case class ShuffleStats(bytesWritten: Long, recordsWritten: Long)

  /** Execute `df` (full materialization, no driver collect) and sum the
    * shuffle-write metrics over every exchange in its plan. */
  def shuffleWrite(df: DataFrame): ShuffleStats = {
    val qe = df.queryExecution
    qe.toRdd.count()
    val exchanges = qe.executedPlan.collect { case e: ShuffleExchangeExec => e }
    ShuffleStats(
      exchanges.map(e => e.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(0L)).sum,
      exchanges.map(e => e.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)).sum)
  }

  /** Run `body` with AQE disabled (restoring the previous setting),
    * so exchange nodes stay visible to [[shuffleWrite]]. */
  def withoutAqe[T](spark: org.apache.spark.sql.SparkSession)(body: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try body finally spark.conf.set(key, prev)
  }
}
