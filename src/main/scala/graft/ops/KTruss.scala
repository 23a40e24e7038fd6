package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-truss decomposition — [[KCore]]'s EDGE-density sibling (Cohen
  * 2008): repeatedly delete every edge contained in fewer than k − 2
  * triangles of the CURRENT graph until none remains. Where the k-core
  * keeps nodes with enough neighbors, the k-truss keeps edges with
  * enough MUTUAL neighbors — the standard community-backbone selector
  * (a 3-truss is exactly "every edge closes at least one triangle",
  * which strips pendant links and chains off near-dup clusters while
  * keeping their dense interiors intact).
  *
  * Takes the repo's symmetrized distinct edge convention and works
  * internally on canonical a < b edges. Returns `(a, b, support)` —
  * the surviving canonical edges with their triangle count inside the
  * truss (≥ k − 2 by construction).
  *
  * Scale shape: each round is one WEDGE join (edges ⋈ edges on the
  * shared lower endpoint, b < c — the degree-ordered orientation that
  * makes every triangle counted exactly once, the [[Triangles]]
  * discipline) closed against the edge set, one 3-way contribution
  * union + map-side-combined count, and one semi-join filter. The edge
  * set only SHRINKS; rounds are [[Iterate.loopBarrier]]-truncated
  * (each round references the previous frame THRICE) and bounded by
  * `maxIter` with a THROW on non-convergence — never a superset
  * answer. Truss peeling cascades at most once per deleted edge, and
  * on similarity graphs (dense cluster interiors, thin fringes) it
  * converges in a handful of rounds. Convergence is detected from the
  * kept-count alone — the previous round's cardinality is CARRIED in a
  * driver variable, never recounted, so each peel round costs exactly
  * one counting job on top of its barrier.
  */
object KTruss {

  private def support(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    // triangles in a<b orientation: (a,b) ∧ (a,c) with b<c ∧ (b,c)
    val tri = e.select($"a", $"b")
      .join(e.select($"a", $"b".as("c")), Seq("a"))
      .where($"b" < $"c")
      .join(e.select($"a".as("b"), $"b".as("c")), Seq("b", "c"))
      .select($"a", $"b", $"c")
    tri.select($"a", $"b")
      .unionByName(tri.select($"a", $"c".as("b")))
      .unionByName(tri.select($"b".as("a"), $"c".as("b")))
      .groupBy($"a", $"b").agg(count(lit(1)).as("support"))
  }

  /** One full peel to the k-truss fixpoint over canonical (a, b)
    * edges. Returns the converged `(a, b, support)` frame (barriered)
    * and its cardinality — the count every caller needs next anyway,
    * so it never has to be recomputed.
    *
    * `sup0`: supports ALREADY VALID for e0 (a previous peel's converged
    * frame — [[decompose]]'s phase hand-off). The first round then
    * filters instead of recomputing the wedge join: if nothing drops,
    * e0 was already the k-truss and the peel is free; if edges drop,
    * the loop continues with fresh supports. Skips one wedge join per
    * phase — the dominant cost on dense graphs. */
  private def peel(e0: DataFrame, n0: Long, k: Int,
      maxIter: Int, sup0: Option[DataFrame] = None): (DataFrame, Long) = {
    val spark = e0.sparkSession
    import spark.implicits._
    val minSup = (k - 2).toLong
    var e = e0
    var nPrev = n0
    var round = 0
    sup0.foreach { s =>
      val kept = Iterate.loopBarrier(s.where($"support" >= minSup))
      val nKept = kept.count()
      if (nKept == nPrev) return (kept, nKept)
      nPrev = nKept
      e = kept.select($"a", $"b")
    }
    while (round < maxIter) {
      round += 1
      val kept = Iterate.loopBarrier(
        e.join(support(e), Seq("a", "b"), "left_outer")
          .select($"a", $"b",
            coalesce($"support", lit(0L)).as("support"))
          .where($"support" >= minSup))
      val nKept = kept.count()
      if (nKept == nPrev) return (kept, nKept)
      nPrev = nKept
      e = kept.select($"a", $"b")
    }
    throw new IllegalStateException(
      s"k-truss did not converge in $maxIter rounds — raise maxIter")
  }

  private def canonical(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    edges.select($"src".as("a"), $"dst".as("b"))
      .where($"a" < $"b").distinct()
  }

  def run(edges: DataFrame, k: Int, maxIter: Int = 20): DataFrame = {
    require(k >= 3, s"k must be >= 3 for a meaningful truss, got $k")
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    val e0 = Iterate.loopBarrier(canonical(edges))
    peel(e0, e0.count(), k, maxIter)._1
  }

  /** Full truss DECOMPOSITION: the trussness t(e) = max k such that
    * edge e survives the k-truss peel, for every canonical edge (every
    * edge has t ≥ 2 — the 2-truss is the whole graph), SATURATED at
    * `maxK`: survivors of the maxK-peel are labeled maxK whatever
    * their true (deeper) trussness. This is the readout a curation
    * dashboard wants — "how deep in the community backbone does this
    * near-dup edge sit" — and the saturation is what makes it
    * well-defined on DENSE graphs: a near-clique cluster of size s has
    * trussness s, and peeling a 100-TB similarity graph to level
    * s ≈ cluster size answers nothing the maxK level didn't (the
    * round-10 scale gate hit exactly this: constant-size ~200-node
    * clusters at m10 → 1.99M edges with trussness ≈ 200).
    *
    * Shape: successive peels at k = 3, 4, … maxK — each starting from
    * the PREVIOUS truss's survivors (E_k ⊆ E_{k−1}, so phase cost
    * shrinks monotonically and the k = 3 phase dominates); edges
    * dropped by the k-peel get trussness k − 1 via one anti-join per
    * phase; each dropped frame is barriered so the final union replays
    * nothing. Phase count is maxK − 2 regardless of graph density. */
  def decompose(edges: DataFrame, maxK: Int = 8,
      maxIter: Int = 20): DataFrame = {
    require(maxK >= 3, s"maxK must be >= 3, got $maxK")
    val spark = edges.sparkSession
    import spark.implicits._
    var cur = Iterate.loopBarrier(canonical(edges))
    var nCur = cur.count()
    var k = 3
    var labeled = List.empty[DataFrame]
    // converged supports of the previous phase — valid for `cur`, so
    // each phase's first round filters instead of re-wedge-joining
    var curSup: Option[DataFrame] = None
    while (nCur > 0 && k <= maxK) {
      val (kept, nKept) = peel(cur, nCur, k, maxIter, curSup)
      labeled = Iterate.loopBarrier(
        cur.join(kept, Seq("a", "b"), "left_anti")
          .select($"a", $"b", lit((k - 1).toLong).as("trussness"))) :: labeled
      cur = kept.select($"a", $"b")
      curSup = Some(kept)
      nCur = nKept
      k += 1
    }
    if (nCur > 0) // saturate: maxK-peel survivors are "at least maxK"
      labeled = Iterate.loopBarrier(
        cur.select($"a", $"b", lit(maxK.toLong).as("trussness"))) :: labeled
    if (labeled.isEmpty) // empty graph: empty labeling, correct schema
      cur.select($"a", $"b", lit(2L).as("trussness"))
    else labeled.reduce(_ unionByName _)
  }
}
