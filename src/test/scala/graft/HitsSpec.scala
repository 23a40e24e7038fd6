package graft

import graft.ops.Hits

/** HITS: hand-computed goldens plus randomized parity against a
  * driver-side sequential replay of the exact integer recurrence. */
class HitsSpec extends SparkSpec {

  import spark.implicits._

  private def replay(edges: Seq[(Long, Long)], iterations: Int,
      scale: Long = 10000L): (Map[Long, Long], Map[Long, Long]) = {
    var a = edges.map(_._2).distinct.map(_ -> scale).toMap
    var h = Map.empty[Long, Long]
    for (_ <- 1 to iterations) {
      val hRaw = edges.groupBy(_._1).map { case (c, es) => c -> es.map(e => a(e._2)).sum }
      val hMax = hRaw.values.max
      h = hRaw.map { case (c, s) => c -> (s * scale) / hMax }
      val aRaw = edges.groupBy(_._2).map { case (p, es) => p -> es.map(e => h(e._1)).sum }
      val aMax = aRaw.values.max
      a = aRaw.map { case (p, s) => p -> (s * scale) / aMax }
    }
    (h, a)
  }

  private def run(edges: Seq[(Long, Long)], iterations: Int) = {
    val (hdf, adf) = Hits.run(edges.toDF("hub", "auth"), iterations)
    (hdf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap,
      adf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }

  test("hand-computed golden: skewed bipartite graph") {
    val edges = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 12L))
    val (h, a) = run(edges, 2)
    // round 1: h = (30000, 10000) → (10000, 3333); a = (10000, 10000, 13333) → (7500, 7500, 10000)
    // round 2: h = (25000, 10000) → (10000, 4000); a = (10000, 10000, 14000) → (7142, 7142, 10000)
    assert(h === Map(1L -> 10000L, 2L -> 4000L))
    assert(a === Map(10L -> 7142L, 11L -> 7142L, 12L -> 10000L))
  }

  test("randomized parity with the sequential replay, several iteration depths") {
    val rnd = new scala.util.Random(31L)
    val edges = (1 to 300).map(_ =>
      (rnd.nextInt(20).toLong, 100L + rnd.nextInt(30))).distinct
    for (k <- Seq(1, 3)) {
      val (h, a) = run(edges, k)
      val (hw, aw) = replay(edges, k)
      assert(h === hw, s"hubs diverge at k=$k")
      assert(a === aw, s"auths diverge at k=$k")
    }
  }

  test("symmetric graph settles at equal scores") {
    // complete 2×2 bipartite: perfect symmetry → everyone at scale
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L))
    val (h, a) = run(edges, 2)
    assert(h.values.toSet === Set(10000L))
    assert(a.values.toSet === Set(10000L))
  }
}
