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
}
