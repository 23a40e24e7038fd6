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
  def loopBarrier(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(true)
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }
}
