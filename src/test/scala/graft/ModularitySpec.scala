package graft

import graft.ops.Modularity

/** Modularity goldens: the hand-computed two-triangle graph, the
  * single-community zero law, and unlabeled-node exclusion. */
class ModularitySpec extends SparkSpec {

  import spark.implicits._

  private val twoTriangles = Seq(
    (1L, 2L), (1L, 3L), (2L, 3L), // triangle A
    (4L, 5L), (4L, 6L), (5L, 6L), // triangle B
    (3L, 4L)                      // bridge
  ).toDF("id_a", "id_b")

  test("two triangles with a bridge: per-community contribution exact") {
    // m = 7; each community: e_in = 3, d_tot = 2+2+3 = 7
    // q_bp = (10⁴·(4·7·3 − 49)) div (4·49) = 350000 div 196 = 1785
    val labels = Seq((1L, "A"), (2L, "A"), (3L, "A"),
      (4L, "B"), (5L, "B"), (6L, "B")).toDF("id", "label")
    val out = Modularity.modularity(twoTriangles, labels)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("A") === ((3L, 3L, 7L, 1785L)))
    assert(out("B") === ((3L, 3L, 7L, 1785L)))
  }

  test("one community holding every node scores exactly zero") {
    val labels = (1L to 6L).map(i => (i, "all")).toDF("id", "label")
    val out = Modularity.modularity(twoTriangles, labels).collect()
    // e_in = m and d_tot = 2m -> 4·m·m − (2m)² = 0
    assert(out.length === 1 &&
      out.head.getLong(2) === 7L && out.head.getLong(4) === 0L)
  }

  test("unlabeled endpoints drop from the census but edges still count " +
      "toward m; negative contributions truncate toward zero") {
    // one edge, one labeled endpoint: e_in = 0, d_tot = 1,
    // q_bp = (10⁴·(0 − 1)) div 4 = −2500
    val edges = Seq((1L, 2L)).toDF("id_a", "id_b")
    val labels = Seq((1L, "A")).toDF("id", "label")
    val out = Modularity.modularity(edges, labels).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === (("A", 1L, 0L, 1L, -2500L)))
  }
}
