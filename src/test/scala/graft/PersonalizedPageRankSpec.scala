package graft

import graft.ops.PersonalizedPageRank

/** PPR goldens: hand-computed integer iterations on a weighted graph,
  * seed-only teleport, weight-proportional splits, reachability
  * filtering — the unrolled-CTE oracle only replays one fixed graph. */
class PersonalizedPageRankSpec extends SparkSpec {

  import spark.implicits._

  private def run(edges: Seq[(Long, Long, Long)], seeds: Seq[Long], iter: Int) =
    PersonalizedPageRank.run(edges.toDF("src", "dst", "w"),
        seeds.toDF("node"), iterations = iter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // seed 1, edges 1→2 (w 3), 1→3 (w 1): r0 = 1e9, base = 150 000 000
  private val g = Seq((1L, 2L, 3L), (1L, 3L, 1L))

  test("one iteration: hand-computed base + weight-proportional contributions") {
    val out = run(g, Seq(1L), iter = 1)
    // contribs: 2 gets (1e9·3) div 4 = 750M, 3 gets 250M; damped ·0.85
    assert(out === Map(1L -> 150000000L, 2L -> 637500000L, 3L -> 212500000L))
  }

  test("two iterations: seed re-emits only its base; sinks absorb") {
    val out = run(g, Seq(1L), iter = 2)
    // round 2 contribs come from node 1's 150M only (2 and 3 are sinks)
    assert(out === Map(1L -> 150000000L,
      2L -> 95625000L,   // (8500 · ((150M·3) div 4)) div 10000
      3L -> 31875000L))  // (8500 · ((150M·1) div 4)) div 10000
  }

  test("teleport mass returns ONLY to seeds; unreachable nodes are absent") {
    // component {5,6} is disconnected from the seed: no rows for it
    val out = run(g ++ Seq((5L, 6L, 1L)), Seq(1L), iter = 3)
    assert(!out.contains(5L) && !out.contains(6L))
    assert(out(1L) === 150000000L)
  }

  test("multi-seed: initial mass splits scale div |S| per seed") {
    val out = run(Seq((1L, 3L, 1L), (2L, 3L, 1L)), Seq(1L, 2L), iter = 1)
    // r0 = 5e8 each, base = (1500 · 5e8) div 10000 = 75M per seed;
    // 3 receives both full contributions: (8500 · 1e9) div 10000
    assert(out === Map(1L -> 75000000L, 2L -> 75000000L, 3L -> 850000000L))
  }

  test("zero/negative weights are dropped, not divided by") {
    val out = run(Seq((1L, 2L, 0L), (1L, 3L, -5L), (1L, 4L, 2L)), Seq(1L), iter = 1)
    // only the w=2 edge exists: 4 gets the whole damped rank
    assert(out === Map(1L -> 150000000L, 4L -> 850000000L))
  }
}
