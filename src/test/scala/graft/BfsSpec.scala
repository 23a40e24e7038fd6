package graft

import graft.ops.Bfs

/** Multi-source BFS goldens: exact hop distances on hand graphs, the
  * min-over-seeds semantics, the radius cutoff, and a randomized parity
  * run against a sequential reference — properties the chained-CTE
  * oracle only exercises on one fixed graph. */
class BfsSpec extends SparkSpec {

  import spark.implicits._

  private def sym(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  private def run(edges: Seq[(Long, Long)], seeds: Seq[Long], maxHops: Int) =
    Bfs.run(sym(edges), seeds.toDF("node"), maxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("path graph: hops count up from the seed; unreachable component absent") {
    val out = run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (8L, 9L)), Seq(1L), maxHops = 10)
    assert(out === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("multi-source takes the MINIMUM distance over seeds") {
    // path 1..7 seeded at both ends: middle node 4 is 3 from either
    val out = run((1L to 6L).map(i => (i, i + 1)), Seq(1L, 7L), maxHops = 10)
    assert(out === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      5L -> 2L, 6L -> 1L, 7L -> 0L))
  }

  test("maxHops bounds the radius; hops never exceed it") {
    val out = run((1L to 6L).map(i => (i, i + 1)), Seq(1L), maxHops = 2)
    assert(out === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("maxHops = 0 returns exactly the deduped seed set at hop 0") {
    val out = run(Seq((1L, 2L)), Seq(1L, 1L, 5L), maxHops = 0)
    assert(out === Map(1L -> 0L, 5L -> 0L))
  }

  test("edgeless seed still appears at 0; self-loops never extend a path") {
    val out = run(Seq((3L, 3L), (1L, 2L)), Seq(1L, 42L), maxHops = 5)
    assert(out === Map(1L -> 0L, 2L -> 1L, 42L -> 0L))
  }

  test("cycle: BFS terminates before maxHops when the frontier drains") {
    val out = run(Seq((1L, 2L), (2L, 3L), (3L, 1L)), Seq(1L), maxHops = 50)
    assert(out === Map(1L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("randomized parity with a sequential BFS reference") {
    val rnd = new scala.util.Random(47)
    for (trial <- 1 to 3) {
      val pairs = (1 to 90).map { _ =>
        val a = rnd.nextInt(35).toLong
        var b = rnd.nextInt(35).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      val seeds = (0 until 3).map(_ => rnd.nextInt(35).toLong).distinct
      val got = run(pairs, seeds, maxHops = 4)
      // sequential reference: textbook queue BFS over the adjacency map
      val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
      val dist = scala.collection.mutable.HashMap.empty[Long, Long]
      val q = scala.collection.mutable.Queue.empty[Long]
      seeds.foreach { s => dist(s) = 0L; q.enqueue(s) }
      while (q.nonEmpty) {
        val v = q.dequeue()
        if (dist(v) < 4L)
          adj.getOrElse(v, Nil).foreach { u =>
            if (!dist.contains(u)) { dist(u) = dist(v) + 1L; q.enqueue(u) }
          }
      }
      assert(got === dist.toMap, s"trial $trial")
    }
  }

  test("eccentricity: path-graph golden within and beyond the hop bound") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val edges = (path ++ path.map(p => (p._2, p._1))).toDF("src", "dst")
    val full = graft.ops.Bfs.eccentricity(edges, maxHops = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // 4-node path: ends see 3 nodes at ecc 3; middles see 3 at ecc 2
    assert(full === Map(1L -> ((3L, 3L)), 2L -> ((3L, 2L)),
      3L -> ((3L, 2L)), 4L -> ((3L, 3L))))
    // truncated bound: ecc saturates at the bound, reach shrinks
    val cut = graft.ops.Bfs.eccentricity(edges, maxHops = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(cut === Map(1L -> ((1L, 1L)), 2L -> ((2L, 1L)),
      3L -> ((2L, 1L)), 4L -> ((1L, 1L))))
  }
}
