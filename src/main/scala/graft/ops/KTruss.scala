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
  * converges in a handful of rounds.
  */
object KTruss {

  def run(edges: DataFrame, k: Int, maxIter: Int = 20): DataFrame = {
    require(k >= 3, s"k must be >= 3 for a meaningful truss, got $k")
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    val spark = edges.sparkSession
    import spark.implicits._
    val minSup = (k - 2).toLong

    def support(e: DataFrame): DataFrame = {
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

    var e = Iterate.loopBarrier(
      edges.select($"src".as("a"), $"dst".as("b"))
        .where($"a" < $"b").distinct())
    var converged = false
    var round = 0
    while (!converged && round < maxIter) {
      round += 1
      val withSup = Iterate.loopBarrier(
        e.join(support(e), Seq("a", "b"), "left_outer")
          .select($"a", $"b",
            coalesce($"support", lit(0L)).as("support")))
      val kept = Iterate.loopBarrier(
        withSup.where($"support" >= minSup))
      converged = kept.count() == e.count()
      e = kept.select($"a", $"b")
      if (converged) {
        // re-attach the converged supports for the readout
        return kept.select($"a", $"b", $"support")
      }
    }
    throw new IllegalStateException(
      s"k-truss did not converge in $maxIter rounds — raise maxIter")
  }
}
