package graft

import org.apache.spark.sql.DataFrame

import graft.queries._

/** Blanket physical-plan audit over the fourth wave's declared queries:
  * none may contain a cartesian product, an unhinted nested loop, or an
  * unexpected single-partition exchange (the three silent scale
  * killers). Queries with a LEGITIMATE narrow global stage are listed
  * with the reason rather than exempted silently. */
class PlanAuditSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  // (name, builder, allowSinglePartition reason or "")
  private lazy val audited: Seq[(String, DataFrame, String)] = Seq(
    ("ext_dedup_simhash_near", ExtQueries.dedupSimhashNear(spark, sfDir),
      "global orderBy presentation sort"),
    ("ext_sample_dsir", ExtQueries.sampleDsir(spark, sfDir),
      "global orderBy presentation sort"),
    ("ext_budget_select", ExtQueries.budgetSelectQ(spark, sfDir),
      "global orderBy presentation sort"),
    ("ext_budget_lang", ExtQueries.budgetSelectLangQ(spark, sfDir),
      "global orderBy presentation sort"),
    ("ext_sim_triplets", ExtQueries.simTriplets(spark, sfDir),
      "global orderBy presentation sort"),
    ("ext_char_diversity", ExtQueries.charDiversityQ(spark, sfDir),
      "global orderBy presentation sort"),
    ("ext_dedup_report", ExtQueries.dedupReportQ(spark, sfDir),
      "global orderBy presentation sort"),
    ("ext_source_overlap", ExtQueries.sourceOverlapQ(spark, sfDir),
      "source-pair grid is dashboard-sized"),
    ("ext_containment", ExtQueries.containmentQ(spark, sfDir),
      "global orderBy presentation sort"),
    ("ext_ks_drift", RetrievalQueries.ksDrift(spark, sfDir),
      "global orderBy presentation sort"),
    ("ext_blocklist", RetrievalQueries.blocklistQ(spark, sfDir),
      "global orderBy presentation sort"),
    ("ext_text_lm_backoff", ExtQueries.textLmBackoff(spark, sfDir),
      "global orderBy presentation sort"),
    ("ext_term_drift", ExtQueries.termDriftQ(spark, sfDir),
      "TakeOrdered top-k"),
    ("ext_pack_report", ExtQueries.packReportQ(spark, sfDir),
      "global orderBy presentation sort"),
    ("ext_ols_moments", RetrievalQueries.olsMoments(spark, sfDir),
      "3-group result, presentation sort"),
    ("ev10_conversion_time", EventQueries.conversionTime(spark, sfDir),
      "global orderBy presentation sort"))

  test("fourth-wave queries: no cartesian product, no unhinted nested loop") {
    audited.foreach { case (name, df, _) =>
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
      // sourceOverlap's 5x5 grid cross join broadcasts by design
      if (name != "ext_source_overlap")
        assert(!p.contains("BroadcastNestedLoopJoin") ||
          p.contains("Broadcast"), s"$name:\n$p")
    }
  }

  test("fourth-wave queries: single-partition exchanges only where a global sort/k is the point") {
    audited.foreach { case (name, df, reason) =>
      val p = plan(df)
      if (p.contains("SinglePartition"))
        assert(reason.nonEmpty, s"$name has an UNEXPLAINED SinglePartition:\n$p")
    }
  }
}
