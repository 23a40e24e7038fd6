package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source weighted shortest paths (distributed Bellman–Ford) —
  * the third answer to the blast-radius question: [[Bfs]] counts hops,
  * [[PersonalizedPageRank]] measures influence mass, this measures the
  * cheapest WEIGHTED distance (with distance = 10000 − cos_q4 on a
  * near-dup graph, "how semantically far is this doc from the flagged
  * set along the duplicate chain").
  *
  * Relaxation round (all-integer, so the oracle replays it exactly):
  *   d'(v) = min(d(v), min over edges (u,v) of d(u) + w(u,v)),
  * run to the FIXPOINT with a `maxRounds` guard that THROWS rather than
  * return inflated distances (Bellman–Ford converges in ≤ diameter
  * rounds; weights must be > 0 — enforced — so no negative cycles).
  * Convergence is probed with a (count, sum) pair: relaxation only
  * ever decreases distances and only ever adds nodes, so an unchanged
  * (row count, Σd) IS the fixpoint — no per-round change-detection
  * join.
  *
  * Scale shape: per round one dist⋈edges hash join + one
  * map-side-combined min aggregate; the distance frame checkpoints per
  * round (flat lineage, the PageRank contract), and early rounds touch
  * only the seed neighborhood (unreached nodes simply have no row).
  * Unreachable nodes stay absent — the infinite-distance encoding
  * shared with [[Bfs]]. */
object Sssp {

  def run(edges: DataFrame, seeds: DataFrame, maxRounds: Int = 12): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val spark = edges.sparkSession
    import spark.implicits._

    // loop barriers, not plain persists: each round references `dist`
    // TWICE (union + join), so without plan truncation the logical tree
    // doubles per round and the driver wedges in analysis at ~10 rounds
    // even with every byte cached (see Iterate.loopBarrier)
    val e = Iterate.loopBarrier(
      edges.select($"src", $"dst", $"w").where($"w" > 0))
    // the (count, Σd) convergence signature rides the barrier's own
    // materialization job (loopBarrierProbe) — r13: the separately
    // planned probe aggregate was one of the two driver jobs this loop
    // paid per round on KB-sized frames (measured: 104 jobs for 1.4 s
    // of total task time at sf0.1; guide §5 driver overhead). `d` is
    // never null, so (count, sum) here ≡ the former
    // agg(count(lit(1)), coalesce(sum(d), 0)) probe exactly.
    var (dist, sig0) = Iterate.loopBarrierProbe(
      seeds.select(seeds.columns.head).toDF("node").distinct()
        .select($"node", lit(0L).as("d")), Seq("d"))
    var sig = sig0(0)
    var round = 0
    var converged = false
    while (!converged) {
      if (round >= maxRounds)
        throw new IllegalStateException(
          s"Bellman-Ford did not converge in $maxRounds rounds — " +
            "refusing to return inflated distances")
      val cand = dist.join(e, dist("node") === e("src"))
        .select($"dst".as("node"), ($"d" + $"w").as("d"))
      val (next, st) = Iterate.loopBarrierProbe(dist.unionByName(cand)
        .groupBy($"node").agg(min($"d").as("d")), Seq("d"))
      val nextSig = st(0)
      dist = next
      converged = nextSig == sig
      sig = nextSig
      round += 1
    }
    dist.select($"node", $"d".as("dist"))
  }
}
