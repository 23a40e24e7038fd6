package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryGroup, Tables}
import graft.ops.Journeys

/** Event-journey analytics (bonus surface): ordered funnels and weekly
  * cohort retention over the events table. The oracles use a DIFFERENT
  * formulation than the engine (chained relational mins / date_diff
  * arithmetic vs the sorted-array state machine), so a hash match pins
  * the semantics, not a replay. */
object EventQueries extends QueryGroup {

  private def load(spark: SparkSession, dir: String, t: String) =
    Tables.load(spark, dir, t)

  /** view → click → purchase chained-earliest funnel per user. */
  def funnel(spark: SparkSession, dir: String): DataFrame =
    Journeys.funnel(load(spark, dir, "events"),
        Seq("view", "click", "purchase"))
      .orderBy(col("user_id"))

  private val funnelSql =
    """WITH ev AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      |  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
      |s1 AS (SELECT user_id, min(ts) AS t1 FROM ev
      |       WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM ev e
      |       JOIN s1 ON e.user_id = s1.user_id
      |       WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM ev e
      |       JOIN s2 ON e.user_id = s2.user_id
      |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1),
      |u AS (SELECT DISTINCT user_id FROM ev)
      |SELECT u.user_id,
      |  (CASE WHEN s1.t1 IS NOT NULL THEN 1 ELSE 0 END +
      |   CASE WHEN s2.t2 IS NOT NULL THEN 1 ELSE 0 END +
      |   CASE WHEN s3.t3 IS NOT NULL THEN 1 ELSE 0 END)::INT AS stage,
      |  s1.t1, s2.t2, s3.t3
      |FROM u
      |LEFT JOIN s1 ON u.user_id = s1.user_id
      |LEFT JOIN s2 ON u.user_id = s2.user_id
      |LEFT JOIN s3 ON u.user_id = s3.user_id
      |ORDER BY u.user_id""".stripMargin

  /** Weekly cohort retention (first-event week × active-week offset). */
  def retention(spark: SparkSession, dir: String): DataFrame =
    Journeys.retention(load(spark, dir, "events"))
      .orderBy(col("cohort_week"), col("week_offset"))

  private val retentionSql =
    """WITH f AS (
      |  SELECT user_id, date_trunc('week', min(CAST(ts AS TIMESTAMP)))::DATE
      |           AS cohort_week
      |  FROM events GROUP BY 1),
      |a AS (
      |  SELECT DISTINCT e.user_id, f.cohort_week,
      |         (date_diff('day', f.cohort_week,
      |                    CAST(e.ts AS TIMESTAMP)::DATE) // 7)::BIGINT
      |           AS week_offset
      |  FROM events e JOIN f USING (user_id))
      |SELECT cohort_week::TIMESTAMP AS cohort_week, week_offset,
      |       count(*)::BIGINT AS n_users
      |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("ev1_funnel", funnel, Some(funnelSql)),
    QueryDef("ev2_retention", retention, Some(retentionSql)))
}
