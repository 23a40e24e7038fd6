package graft

import org.apache.spark.sql.DataFrame

import graft.queries._

/** Blanket physical-plan audit over the declared queries: none may
  * contain a cartesian product; BroadcastNestedLoopJoin and
  * SinglePartition exchanges (the silent scale killers) are FORBIDDEN
  * except for the entries that explicitly sanction them with a reason —
  * and the allowlists were derived by probing the actual plans, so a
  * query NOT listed that starts planning one fails the suite. The
  * pre-r11 form asserted `!BNLJ || contains("Broadcast")` (a tautology:
  * the BNLJ token itself contains "Broadcast") and `reason.nonEmpty` on
  * hard-coded literals (always true) — only the CartesianProduct check
  * gated anything. */
class PlanAuditSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** One audited query: empty `bnljWhy`/`spWhy` FORBIDS that plan
    * shape; a non-empty reason sanctions it (one-row scalar broadcasts
    * and bounded-cardinality global stages only). */
  private final case class Audit(name: String, df: DataFrame,
      bnljWhy: String = "", spWhy: String = "")

  private def auditAll(entries: Seq[Audit]): Unit = {
    entries.foreach { case Audit(name, df, bnljWhy, spWhy) =>
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
      if (bnljWhy.isEmpty)
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$name plans an UNSANCTIONED nested loop join:\n$p")
      if (spWhy.isEmpty)
        assert(!p.contains("SinglePartition"),
          s"$name has an UNSANCTIONED single-partition exchange:\n$p")
    }
    spark.catalog.clearCache()
  }

  // fourth wave — BNLJ/SinglePartition allowlists probed from the
  // actual sf0.001 plans (AuditProbe, r11); everything else forbidden
  private lazy val audited: Seq[Audit] = Seq(
    Audit("ext_dedup_simhash_near", ExtQueries.dedupSimhashNear(spark, sfDir)),
    Audit("ext_sample_dsir", ExtQueries.sampleDsir(spark, sfDir)),
    Audit("ext_budget_select", ExtQueries.budgetSelectQ(spark, sfDir)),
    Audit("ext_budget_lang", ExtQueries.budgetSelectLangQ(spark, sfDir)),
    Audit("ext_sim_triplets", ExtQueries.simTriplets(spark, sfDir)),
    Audit("ext_char_diversity", ExtQueries.charDiversityQ(spark, sfDir)),
    Audit("ext_dedup_report", ExtQueries.dedupReportQ(spark, sfDir)),
    Audit("ext_source_overlap", ExtQueries.sourceOverlapQ(spark, sfDir),
      bnljWhy = "source-pair grid: 5x5 cross of source-cardinality rollups"),
    Audit("ext_containment", ExtQueries.containmentQ(spark, sfDir)),
    Audit("ext_ks_drift", RetrievalQueries.ksDrift(spark, sfDir)),
    Audit("ext_blocklist", RetrievalQueries.blocklistQ(spark, sfDir)),
    Audit("ext_text_lm_backoff", ExtQueries.textLmBackoff(spark, sfDir)),
    Audit("ext_term_drift", ExtQueries.termDriftQ(spark, sfDir),
      bnljWhy = "one-row corpus-total broadcast",
      spWhy = "TakeOrdered top-k over the vocabulary-bounded drift frame"),
    Audit("ext_pack_report", ExtQueries.packReportQ(spark, sfDir)),
    Audit("ext_ols_moments", RetrievalQueries.olsMoments(spark, sfDir)),
    Audit("ev10_conversion_time", EventQueries.conversionTime(spark, sfDir)))

  // fifth wave
  private lazy val auditedFifth: Seq[Audit] = Seq(
    Audit("ext_embed_prune", ExtQueries.embedPrune(spark, sfDir)),
    Audit("ext_sim_recall", ExtQueries.simRecall(spark, sfDir),
      bnljWhy = "one-row recall-summary broadcast"),
    Audit("ext_assoc_rules", ExtQueries.assocRulesQ(spark, sfDir),
      bnljWhy = "one-row basket-total broadcast",
      spWhy = "support-thresholded itemset frame is rule-cardinality-bounded"),
    Audit("ext_quality_pctile", ExtQueries.qualityPctile(spark, sfDir)),
    Audit("ext_pareto_docs", ExtQueries.paretoDocs(spark, sfDir),
      spWhy = "bounded-domain prefix-min over <=10^4 quantized scores"),
    Audit("ext_sim_rrf", ExtQueries.simRrf(spark, sfDir),
      bnljWhy = "one-row fusion-constant broadcast"),
    Audit("ext_skew_report", ExtQueries.skewReport(spark, sfDir),
      spWhy = "one-row summary"),
    Audit("ext_bootstrap_ci", ExtQueries.bootstrapCiQ(spark, sfDir)),
    Audit("ext_quality_calibration", ExtQueries.qualityCalibration(spark, sfDir)),
    Audit("ev11_attribution", EventQueries.attribution(spark, sfDir)),
    Audit("ev12_decayed_popularity", EventQueries.decayedPopularity(spark, sfDir),
      bnljWhy = "one-row max-timestamp reference broadcast",
      spWhy = "event-type-cardinality rollup"),
    Audit("ev13_frequent_paths", EventQueries.frequentPaths(spark, sfDir)),
    Audit("ev14_ab_test", EventQueries.abTest(spark, sfDir),
      spWhy = "one-row summary"),
    Audit("ev15_ab_lift_ci", EventQueries.abLiftCi(spark, sfDir),
      bnljWhy = "one-row per-arm summary cross (2x1 rows)",
      spWhy = "one-row summary"),
    Audit("w7_ntile_pctrank", WindowQueries.ntilePctRank(spark, sfDir)))

  // sixth wave (round-9 additions)
  private lazy val auditedSixth: Seq[Audit] = Seq(
    Audit("ext_harmonic", ExtQueries.harmonicQ(spark, sfDir)),
    Audit("ext_sketch_hll", ExtQueries.sketchHll(spark, sfDir),
      spWhy = "register-sized frames (256 rows/source)"),
    Audit("ext_mutual_info", ExtQueries.mutualInfo(spark, sfDir),
      bnljWhy = "one-row grand-total broadcast",
      spWhy = "one-row summary over category-sized margins"),
    Audit("ext_negative_sampling", ExtQueries.negativeSampling(spark, sfDir),
      bnljWhy = "one-row candidate-count broadcast"),
    Audit("j34_linkage_fs", LinkageQueries.linkageFs(spark, sfDir)),
    Audit("j35_er_resolve", LinkageQueries.erResolve(spark, sfDir)),
    Audit("ext_hilbert_3d", ExtQueries.hilbert3d(spark, sfDir)))

  // round-10 additions
  private lazy val auditedSeventh: Seq[Audit] = Seq(
    Audit("ext_truss_decompose", ExtQueries.trussDecomposeQ(spark, sfDir)),
    Audit("ext_dedup_ngram_capped", ExtQueries.dedupNgramCapped(spark, sfDir)),
    Audit("ext_dedup_minhash_capped", ExtQueries.dedupMinhashCapped(spark, sfDir)),
    Audit("ext_kappa_langid", ExtQueries.kappaLangId(spark, sfDir),
      bnljWhy = "one-row agreement-total broadcast",
      spWhy = "one-row summary over category-sized margins"),
    Audit("ext_kendall_tau", StatQueries.kendallTauQ(spark, sfDir)),
    Audit("ext_coreset_kcenter", ExtQueries.coresetKcenter(spark, sfDir)),
    Audit("ext_eccentricity", ExtQueries.eccentricityQ(spark, sfDir)))

  test("fourth-wave queries: no cartesian, nested-loop/single-partition " +
      "only where explicitly sanctioned") {
    auditAll(audited)
  }

  test("fifth-wave queries: no cartesian, nested-loop/single-partition " +
      "only where explicitly sanctioned") {
    auditAll(auditedFifth)
  }

  test("sixth-wave queries: no cartesian, nested-loop/single-partition " +
      "only where explicitly sanctioned") {
    auditAll(auditedSixth)
  }

  test("round-10 queries: no cartesian, nested-loop/single-partition " +
      "only where explicitly sanctioned") {
    auditAll(auditedSeventh)
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
