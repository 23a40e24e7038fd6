package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed PageRank over an edge list — the iterative-graph
  * operator next to connected components (`ext.Dedup.resolveComponents`),
  * used on document graphs (near-dup / citation / link edges) to rank
  * canonical or influential members.
  *
  * ALL-INTEGER arithmetic so the oracle replays it exactly: ranks are
  * scaled to `scale` units; one iteration is
  *   contrib(e)  = r(src) div out_deg(src)            (integer div)
  *   r'(v)       = base + (dampBp · Σ contrib) div 10000
  * with `base = ((10000 − dampBp) · (scale div n)) div 10000`. Floor
  * division on non-negative operands — bit-identical in any engine.
  * Sink nodes (out-degree 0) absorb mass like the classic simplified
  * formulation; isolated nodes settle at `base`.
  *
  * Scale shape: each of the K iterations is ONE equi-join of the rank
  * vector (n rows) to the edge list on `src` + one map-side-combined
  * sum on `dst` — shuffle is O(edges) per round, the textbook Pregel
  * cost, with the rank vector persisted between rounds so lineage stays
  * flat (no exponential re-computation). K is a parameter, not a
  * convergence loop: deterministic job count, no driver-side data. */
object PageRank {

  def run(edges: DataFrame, nodes: DataFrame, iterations: Int = 4,
      scale: Long = 1000000000L, dampBp: Int = 8500): DataFrame = {
    require(iterations >= 1 && dampBp >= 0 && dampBp <= 10000)
    val spark = nodes.sparkSession
    import spark.implicits._

    // e feeds BOTH sides of the eDeg merge below; persist it so an
    // expensive upstream (near-dup self-join edges) materializes once,
    // not twice, when eDeg is first computed (ADVICE r12).
    val e = edges.select($"src", $"dst")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // out-degree is LOOP-INVARIANT: merge it onto the edge list ONCE
    // (guide §2.4 — two operations keyed the same way share one
    // exchange) instead of re-joining ranks⋈deg⋈edges every round.
    // Per round this drops one node-scale⋈edge-scale join; the merged
    // list is the same width class (src, dst, out_deg).
    val eDeg = e.join(
        e.groupBy($"src").agg(count(lit(1)).as("out_deg")), "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    eDeg.count()
    e.unpersist()
    val ids = nodes.select($"id").distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = ids.count()
    require(n > 0, "empty node set")
    val r0 = scale / n
    val base = ((10000L - dampBp) * r0) / 10000L

    var ranks = ids.withColumn("r", lit(r0))
      .persist(StorageLevel.MEMORY_AND_DISK)
    ranks.count()
    var prev: DataFrame = null
    for (_ <- 1 to iterations) {
      val contribs = ranks
        .join(eDeg, ranks("id") === eDeg("src"))
        .select($"dst", expr("r div out_deg").as("c"))
        .groupBy($"dst").agg(sum($"c").as("s"))
      val next = ids
        .join(contribs, ids("id") === contribs("dst"), "left")
        .select($"id",
          (lit(base) + expr(s"($dampBp * coalesce(s, 0L)) div 10000")).as("r"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count()
      if (prev != null) prev.unpersist()
      prev = ranks
      ranks = next
    }
    if (prev != null) prev.unpersist()
    eDeg.unpersist()
    val out = ranks.select($"id", $"r".as("rank"))
    ids.unpersist()
    out
  }
}
