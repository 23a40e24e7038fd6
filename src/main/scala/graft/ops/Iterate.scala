package graft.ops

import org.apache.spark.sql.DataFrame

/** Shared guard for relational loops (the twin of the private barrier
  * inside [[graft.ext.Dedup]]): a loop whose round REFERENCES ITS OWN
  * PREVIOUS FRAME MORE THAN ONCE (a self-union, both endpoints of an
  * edge relabel, a min-merge of old ∪ candidates) doubles its LOGICAL
  * plan per round even when every frame is persisted — execution reads
  * the cache, but analysis/optimization walks a 2^rounds tree and the
  * driver dies long before the executors notice (observed: ext_sssp at
  * sf0.1 wedged >10 min in planning with all data cached).
  * `localCheckpoint` truncates the plan; rebuilding from the RDD drops
  * the carried-over origin statistics so each round replans from fresh
  * leaf stats. */
private[graft] object Iterate {
  /** Test hook: every loopBarrier is exactly one eager RDD job, so
    * specs pin a loop's per-round action count against THIS counter
    * (deterministic) instead of SparkListener job totals (AQE splits
    * one Dataset action into a session-config-dependent number of
    * jobs — an absolute job bound flakes on upgrades). */
  private[graft] val barrierCount =
    new java.util.concurrent.atomic.AtomicLong(0L)

  def loopBarrier(df: DataFrame): DataFrame = {
    barrierCount.incrementAndGet()
    // eager checkpoint + measured-stats leaf (no external-Row round
    // trip, no default-stats pessimism) — see GraftSqlShim.measuredBarrier
    org.apache.spark.sql.GraftSqlShim.measuredBarrier(df)
  }

  /** [[loopBarrier]] whose materialization job ALSO computes the
    * caller's convergence probe — per long/boolean column named, the
    * (non-null count, Σ value) pair over the checkpointed rows. One
    * driver job instead of checkpoint-count + separately planned probe
    * aggregate (guide §5: the probes were pure per-round driver
    * latency; values and convergence decisions are unchanged). */
  def loopBarrierProbe(df: DataFrame, probeCols: Seq[String])
      : (DataFrame, Array[(Long, Long)]) = {
    barrierCount.incrementAndGet()
    org.apache.spark.sql.GraftSqlShim.measuredBarrierProbe(df, probeCols)
  }
}
