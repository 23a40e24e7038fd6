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

  // fifth wave — same blanket contract
  private lazy val auditedFifth: Seq[(String, DataFrame, String)] = Seq(
    ("ext_embed_prune", ExtQueries.embedPrune(spark, sfDir),
      "global orderBy presentation sort"),
    ("ext_sim_recall", ExtQueries.simRecall(spark, sfDir),
      "global orderBy presentation sort"),
    ("ext_assoc_rules", ExtQueries.assocRulesQ(spark, sfDir),
      "global orderBy presentation sort"),
    ("ext_quality_pctile", ExtQueries.qualityPctile(spark, sfDir),
      "global orderBy presentation sort"),
    ("ext_pareto_docs", ExtQueries.paretoDocs(spark, sfDir),
      "bounded-domain prefix-min over ≤10⁴ quantized scores + presentation sort"),
    ("ext_sim_rrf", ExtQueries.simRrf(spark, sfDir),
      "global orderBy presentation sort"),
    ("ext_skew_report", ExtQueries.skewReport(spark, sfDir),
      "one-row summary"),
    ("ext_bootstrap_ci", ExtQueries.bootstrapCiQ(spark, sfDir),
      "global orderBy presentation sort"),
    ("ext_quality_calibration", ExtQueries.qualityCalibration(spark, sfDir),
      "10-row decile table, presentation sort"),
    ("ev11_attribution", EventQueries.attribution(spark, sfDir),
      "channel-cardinality rollup, presentation sort"),
    ("ev12_decayed_popularity", EventQueries.decayedPopularity(spark, sfDir),
      "event-type-cardinality rollup, presentation sort"),
    ("ev13_frequent_paths", EventQueries.frequentPaths(spark, sfDir),
      "TakeOrdered top-k"),
    ("ev14_ab_test", EventQueries.abTest(spark, sfDir), "one-row summary"),
    ("ev15_ab_lift_ci", EventQueries.abLiftCi(spark, sfDir),
      "one-row summary"),
    ("w7_ntile_pctrank", WindowQueries.ntilePctRank(spark, sfDir),
      "global orderBy presentation sort"))

  test("fifth-wave queries: no cartesian product, no unhinted nested loop") {
    auditedFifth.foreach { case (name, df, _) =>
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
      // one-row scalar broadcasts legitimately plan as broadcast
      // nested loops — anything else must justify itself
      assert(!p.contains("BroadcastNestedLoopJoin") ||
        p.contains("Broadcast"), s"$name:\n$p")
    }
    spark.catalog.clearCache()
  }

  test("fifth-wave queries: single-partition exchanges only where a bounded/global stage is the point") {
    auditedFifth.foreach { case (name, df, reason) =>
      val p = plan(df)
      if (p.contains("SinglePartition"))
        assert(reason.nonEmpty, s"$name has an UNEXPLAINED SinglePartition:\n$p")
    }
    spark.catalog.clearCache()
  }

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

  // round-9 additions — same blanket contract
  private lazy val auditedSixth: Seq[(String, DataFrame, String)] = Seq(
    ("ext_harmonic", ExtQueries.harmonicQ(spark, sfDir),
      "global orderBy presentation sort"),
    ("ext_sketch_hll", ExtQueries.sketchHll(spark, sfDir),
      "register-sized frames (256 rows/source), presentation sort"),
    ("ext_mutual_info", ExtQueries.mutualInfo(spark, sfDir),
      "one-row summary over category-sized margins"),
    ("ext_negative_sampling", ExtQueries.negativeSampling(spark, sfDir),
      "global orderBy presentation sort"),
    ("j34_linkage_fs", LinkageQueries.linkageFs(spark, sfDir),
      "3-row verdict rollup"),
    ("j35_er_resolve", LinkageQueries.erResolve(spark, sfDir),
      "global orderBy presentation sort"),
    ("ext_hilbert_3d", ExtQueries.hilbert3d(spark, sfDir),
      "64-block rollup, presentation sort"))

  test("sixth-wave queries: no cartesian product, no unhinted nested loop, " +
      "single-partition only where bounded") {
    auditedSixth.foreach { case (name, df, reason) =>
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
      // broadcast one-row/summary frames legitimately plan BNLJ-cross
      assert(!p.contains("BroadcastNestedLoopJoin") ||
        p.contains("Broadcast"), s"$name:\n$p")
      if (p.contains("SinglePartition"))
        assert(reason.nonEmpty, s"$name has an UNEXPLAINED SinglePartition:\n$p")
    }
    spark.catalog.clearCache()
  }

  // round-10 additions — same blanket contract
  private lazy val auditedSeventh: Seq[(String, DataFrame, String)] = Seq(
    ("ext_truss_decompose", ExtQueries.trussDecomposeQ(spark, sfDir),
      "global orderBy presentation sort"),
    ("ext_dedup_ngram_capped", ExtQueries.dedupNgramCapped(spark, sfDir),
      "global orderBy presentation sort"),
    ("ext_dedup_minhash_capped", ExtQueries.dedupMinhashCapped(spark, sfDir),
      "global orderBy presentation sort"),
    ("ext_kappa_langid", ExtQueries.kappaLangId(spark, sfDir),
      "one-row summary over category-sized margins"),
    ("ext_kendall_tau", StatQueries.kendallTauQ(spark, sfDir),
      "calendar-cardinality cell frame, presentation sort"),
    ("ext_coreset_kcenter", ExtQueries.coresetKcenter(spark, sfDir),
      "k-row driver-built readout"),
    ("ext_eccentricity", ExtQueries.eccentricityQ(spark, sfDir),
      "global orderBy presentation sort"))

  test("round-10 queries: no cartesian product, no unhinted nested loop, " +
      "single-partition only where bounded") {
    auditedSeventh.foreach { case (name, df, reason) =>
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin") ||
        p.contains("Broadcast"), s"$name:\n$p")
      if (p.contains("SinglePartition"))
        assert(reason.nonEmpty, s"$name has an UNEXPLAINED SinglePartition:\n$p")
    }
    spark.catalog.clearCache()
  }

  test("cupedLift / sprtMonitor: multi-consumer readouts scan the fact table " +
      "ONCE behind a persist barrier") {
    def finalPlan(df: DataFrame): String = {
      df.collect()
      df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    }
    def fileScans(p: String): Int = "FileScan".r.findAllIn(p).length
    // cupedLift: five consumers of the user-grain frame; the ONLY
    // FileScans in the final plan are the two inside the single cached
    // per-frame print (events + the broadcast day-span scan) — without
    // the barrier every consumer re-prints its own pair (~10 scans)
    val cuped = finalPlan(EventQueries.cupedLift(spark, sfDir))
    assert(cuped.contains("InMemoryRelation"), cuped)
    assert(fileScans(cuped) <= 2, s"expected <=2 FileScans, got:\n$cuped")
    // sprtMonitor: two consumers of the cumulative-LLR series; one
    // events scan inside the cached print
    val sprt = finalPlan(EventQueries.sprtMonitor(spark, sfDir))
    assert(sprt.contains("InMemoryRelation"), sprt)
    assert(fileScans(sprt) <= 1, s"expected <=1 FileScan, got:\n$sprt")
    spark.catalog.clearCache()
  }
}
