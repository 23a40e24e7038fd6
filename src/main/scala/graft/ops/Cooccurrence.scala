package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Bipartite → unipartite co-occurrence projection: from (hub, item)
  * edges, the item–item graph weighted by shared-hub count — the
  * co-purchase / co-click / co-citation graph builder that feeds
  * similarity ("customers also bought"), clustering, and the graph
  * operators ([[PageRank]], [[Hits]], components).
  *
  * The projection is inherently quadratic in hub degree (a hub of
  * degree d mints C(d, 2) pairs), so hubs above `maxDegree` are
  * DROPPED, not truncated — the standard stop-hub rule (a customer who
  * buys everything links everything to everything and carries no
  * signal, exactly like a stop-gram in [[graft.ext.Contamination]]'s
  * maxDf cap). The cap bounds per-hub work at C(maxDegree, 2) BEFORE
  * the self-join, so the worst case is maxDegree·|edges| pair rows —
  * linear in the input for a fixed cap — and a single hot hub can
  * never detonate the shuffle.
  *
  * Scale shape: dedup → degree census (one map-side-combined count) →
  * semi-filter → per-hub collect (≤ maxDegree items by the filter, so
  * the aggregation buffer is cap-bounded) → IN-ROW i<j pair explode →
  * one map-side-combined pair count. The r12 optimization replaced the
  * hub-keyed self-join here: the join materialized every raw pair row
  * into its own exchange (69 MB at sf0.1 — guide §2.3/§3.3, never
  * explode into a shuffle you can aggregate first); the in-row explode
  * feeds the pair count's partial aggregation INSIDE the same stage,
  * so only combined (item_a, item_b, n) partials cross the wire.
  * Pairs are emitted canonically (item_a < item_b, every 2-subset
  * once), so no distinct pass is needed. */
object Cooccurrence {

  def project(edges: DataFrame, maxDegree: Int): DataFrame = {
    require(maxDegree >= 2, s"maxDegree must be >= 2, got $maxDegree")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select($"hub", $"item").distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy($"hub").agg(count(lit(1)).as("_d"))
    // the census runs BEFORE any per-hub collection, so a hot hub is
    // dropped by a counter, never buffered; the collect_list below is
    // therefore ≤ maxDegree items per group by construction. The
    // groupBy(hub) after the hub-keyed semi-join reuses the join's
    // partitioning — one exchange establishes both (guide §2.4).
    e.join(deg.where($"_d" <= maxDegree).select($"hub"), "hub")
      .groupBy($"hub").agg(collect_list($"item").as("_its"))
      // AQE sizes the post-aggregation stage from the COLLECTED frame's
      // bytes and cannot see the ~maxDegree/2× pair explode below it —
      // at sf0.1 it coalesced the 2.6 MB list frame to 2 tasks and ran
      // the 69 MB explosion single-threaded. Pin the explode's
      // parallelism to the configured shuffle width (scale-adaptive:
      // the same knob a cluster deploy tunes), which AQE honors because
      // the partition count is explicit.
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt,
        $"hub")
      .select(explode(expr(
        """flatten(transform(_its, (x, i) ->
          |  transform(slice(_its, i + 2, size(_its) - i - 1), y ->
          |    struct(least(x, y) AS item_a, greatest(x, y) AS item_b))))"""
          .stripMargin)).as("p"))
      .select($"p.item_a", $"p.item_b")
      .groupBy($"item_a", $"item_b")
      .agg(count(lit(1)).as("n_shared"))
  }
}
