package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Common-neighbor link prediction over an undirected pair list — the
  * candidate-expansion step of entity resolution / dedup pipelines
  * ("these two docs share several near-dup partners but were never
  * paired directly — probably a missed pair") and the classic
  * link-prediction baseline family (Liben-Nowell & Kleinberg 2007).
  *
  * Per candidate pair (a, b) NOT already an edge:
  *  - `cn`         — common-neighbor count,
  *  - `jaccard_bp` — ⌊10⁴·cn ∕ (deg a + deg b − cn)⌋ (neighborhood
  *                   Jaccard),
  *  - `ra_q8`      — resource allocation, Σ_z ⌊10⁸∕deg z⌋ over common
  *                   neighbors z (Zhou et al. 2009) — chosen over
  *                   Adamic–Adar BECAUSE it is rational: the scores are
  *                   exact integers any engine reproduces, where
  *                   1∕log(deg) is not.
  *
  * Scale shape: candidates come from WEDGES (two edges sharing a
  * center), grouped by the center vertex — the only shuffles are the
  * adjacency key exchanges; no all-pairs anywhere. A hub of degree d
  * would mint d² wedges, so centers above `maxDeg` are EXCLUDED from
  * wedge generation (standard hub suppression: a node connected to
  * everything carries no pairing signal — same discipline as the
  * prefix-filter caps in the dedup family); full degrees still feed
  * the Jaccard denominator. `minCommon` bounds the output to pairs
  * with real support.
  */
object LinkPredict {

  private implicit class Interp(private val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }

  def neighborScores(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", maxDeg: Long = 64L,
      minCommon: Long = 2L): DataFrame = {
    require(maxDeg >= 1 && minCommon >= 1,
      s"maxDeg and minCommon must be >= 1, got ($maxDeg, $minCommon)")
    val und = pairs
      .select(col(aCol).as("u0"), col(bCol).as("v0"))
      .where($"u0".isNotNull && $"v0".isNotNull && $"u0" =!= $"v0")
      .select(least($"u0", $"v0").as("u"), greatest($"u0", $"v0").as("v"))
      .distinct()
    val adj = und.select($"u".as("z"), $"v".as("x"))
      .unionByName(und.select($"v".as("z"), $"u".as("x")))
    val deg = adj.groupBy($"z").agg(count(lit(1)).as("deg"))
    val centers = adj.join(deg.where($"deg" <= maxDeg), Seq("z"))
    val wedges = centers.select($"z", $"x".as("a"), $"deg")
      .join(centers.select($"z", $"x".as("b")), Seq("z"))
      .where($"a" < $"b")
    val cand = wedges.groupBy($"a", $"b")
      .agg(count(lit(1)).as("cn"),
        sum(expr("100000000 div deg")).as("ra_q8"))
      .where($"cn" >= minCommon)
    val nonEdges = cand.join(und,
        cand("a") === und("u") && cand("b") === und("v"), "left_anti")
    nonEdges
      .join(deg.select($"z".as("a"), $"deg".as("_da")), Seq("a"))
      .join(deg.select($"z".as("b"), $"deg".as("_db")), Seq("b"))
      .select($"a".as(aCol), $"b".as(bCol), $"cn",
        expr("(10000 * cn) div (_da + _db - cn)").as("jaccard_bp"),
        $"ra_q8")
  }
}
