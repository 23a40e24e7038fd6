package graft

import graft.ops.LinkPredict

/** Common-neighbor link prediction: hand-computed wedge goldens,
  * existing-edge exclusion, hub suppression, exact rational RA scores. */
class LinkPredictSpec extends SparkSpec {

  import spark.implicits._

  test("diamond graph: the one non-edge with two common neighbors, exact scores") {
    // edges 1-2, 1-3, 2-3, 2-4, 3-4: the only cn>=2 NON-edge is (1,4)
    // through centers {2, 3} (deg 3 each); (2,3) shares {1,4} but IS an
    // edge and must not reappear
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("id_a", "id_b")
    val out = LinkPredict.neighborScores(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.keySet === Set((1L, 4L)))
    val (cn, jac, ra) = out((1L, 4L))
    assert(cn === 2L)
    assert(jac === 10000L)            // deg1=2, deg4=2: 2/(2+2-2)
    assert(ra === 2L * (100000000L / 3L)) // two deg-3 centers, exact div
  }

  test("hub suppression: a star center above maxDeg mints no wedges; " +
      "lowering the bar or raising the cap brings them back") {
    val star = (1L to 5L).map(l => (9L, l)).toDF("id_a", "id_b")
    assert(LinkPredict.neighborScores(star, maxDeg = 3L).isEmpty)
    // cap admits the center but pairs share only ONE neighbor
    assert(LinkPredict.neighborScores(star, maxDeg = 10L).isEmpty)
    val loose = LinkPredict
      .neighborScores(star, maxDeg = 10L, minCommon = 1L).collect()
    assert(loose.length === 10) // C(5,2) leaf pairs
    assert(loose.forall(_.getLong(2) === 1L))
  }

  test("undirected + dedup: reversed and duplicate input pairs don't double-count") {
    val e = Seq((1L, 2L), (2L, 1L), (1L, 2L), (1L, 3L), (3L, 1L))
      .toDF("id_a", "id_b")
    // neighbors of 1 = {2, 3}; pair (2, 3) shares exactly center 1 once
    val out = LinkPredict.neighborScores(e, minCommon = 1L).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(out === Map((2L, 3L) -> 1L))
  }
}
