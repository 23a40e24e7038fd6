package graft

/** The interval-join rewrite must fire ONLY on user-shaped overlap
  * joins — never inside the engine's own composed operators. Pins the
  * executed plans of the queries whose internals are join-heavy. */
class RewriteIsolationSpec extends SparkSpec {

  private val names = Seq("ext_dedup_semantic", "ext_spearman",
    "ext_t_closeness", "ext_term_drift", "j11_explode_join",
    "j20_interval_overlap", "j18_range_join", "j22_radius_join")

  test("engine queries keep their own plans: no IntervalJoin node appears") {
    val qs = SparkEntry.queries
    names.foreach { n =>
      val plan = qs(n)(spark, sfDir).queryExecution.executedPlan.toString
      assert(!plan.contains("IntervalJoin"),
        s"$n was rewritten by IntervalJoinRewrite:\n${plan.take(2000)}")
    }
  }
}
