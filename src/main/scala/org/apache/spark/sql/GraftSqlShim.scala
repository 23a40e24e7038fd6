package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal access shim for the one `private[sql]` constructor a custom
  * whole-operator extension needs: turning a hand-built (already
  * resolved) [[LogicalPlan]] node back into a public [[DataFrame]].
  * Everything else in graft's planner extension (logical node, strategy,
  * physical operator) uses only `@DeveloperApi`-grade Catalyst surfaces;
  * this is the standard packaging trick Spark extension libraries use
  * for plan construction. */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Eager local checkpoint with MEASURED statistics — the loop barrier
    * for iterative relational operators (Iterate.loopBarrier,
    * Dedup.loopBarrier). Replaces the old
    * `createDataFrame(ck.rdd, ck.schema)` rebuild, which had two costs
    * measured in the r12 optimization round:
    *
    *  1. it deserialized every row to an external `Row` (interpreted
    *     CatalystTypeConverters) and re-encoded it back — the dominant
    *     task CPU of the iterative graph family (ext_msf: ~89
    *     task-CPU-seconds on <1 MB of data);
    *  2. the rebuilt leaf carried DEFAULT statistics
    *     (`defaultSizeInBytes` = huge), so every join of a small loop
    *     frame (score vector, frontier, contracted edge list) against
    *     the big persisted edge list planned as a full sort-merge
    *     shuffle of the big side EVERY round — guide §3.1's "estimates
    *     are often badly wrong" failure, in the pessimistic direction.
    *
    * This keeps the checkpoint's own `LogicalRDD` (unsafe rows end to
    * end, physical partitioning preserved) and swaps its origin stats —
    * whose carried-over derived `sizeInBytes` doubles in BIT LENGTH per
    * join round (the BigInteger driver hazard resolveComponents
    * documents) — for the checkpoint's measured block sizes: exact,
    * bounded, and scale-adaptive. A frame measured under the broadcast
    * threshold broadcasts (no per-round shuffle of the big side); a
    * frame that grows past it shuffles, exactly as 100 TB requires.
    * Falls back to default stats when the block sizes are unavailable
    * (never under-estimates into an unsafe broadcast). */
  def measuredBarrier(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val spark = ds.sparkSession
    val ck = ds.localCheckpoint(true).asInstanceOf[classic.Dataset[Row]]
    ck.queryExecution.analyzed match {
      case lr: execution.LogicalRDD =>
        val measured = spark.sparkContext.getRDDStorageInfo
          .find(_.id == lr.rdd.id)
          .map(i => i.memSize + i.diskSize)
          .filter(_ > 0L)
        // 4x safety margin (ADVICE r12): memSize is a SizeEstimator
        // SAMPLE of the deserialized blocks; an under-report on a frame
        // near the broadcast threshold could otherwise plan a driver-OOM
        // broadcast. Loop frames this barrier serves are KBs against a
        // 10 MB threshold, so the margin never costs a wanted broadcast.
        val stats = measured.map(b =>
          catalyst.plans.logical.Statistics(sizeInBytes = BigInt(4L * b)))
        classic.Dataset.ofRows(spark, execution.LogicalRDD(
          lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering,
          lr.isStreaming, None)(spark, stats, None))
      case _ => ck // unexpected plan shape: keep the checkpoint as-is
    }
  }
}
