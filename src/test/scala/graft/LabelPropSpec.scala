package graft

import graft.ops.LabelProp
import org.apache.spark.sql.functions._

/** LPA goldens: equivalence with an in-driver reference implementation
  * (the PageRankSpec pattern), community separation on a two-clique
  * graph, isolated-node stability, and partitioning-independence. */
class LabelPropSpec extends SparkSpec {

  import spark.implicits._

  /** Reference LPA: same deterministic rule (most-frequent in-neighbor
    * label, min tie-break, keep own when no in-edges), synchronous. */
  private def reference(edges: Seq[(Long, Long)], nodes: Seq[Long],
      iters: Int): Map[Long, Long] = {
    var lab = nodes.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      val byDst = edges.groupBy(_._2)
      lab = nodes.map { n =>
        byDst.get(n) match {
          case None => n -> lab(n)
          case Some(es) =>
            val counts = es.groupBy(e => lab(e._1)).view.mapValues(_.size)
            val best = counts.toSeq.minBy { case (l, c) => (-c, l) }._1
            n -> best
        }
      }.toMap
    }
    lab
  }

  private def run(edges: Seq[(Long, Long)], nodes: Seq[Long], iters: Int) =
    LabelProp.run(edges.toDF("src", "dst"), nodes.toDF("id"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two cliques with one bridge: each clique converges to its own min label") {
    // cliques {1,2,3} and {10,11,12}, bridge 3-10, plus isolate 99
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L))
    val edges = und ++ und.map(_.swap)
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 12L, 99L)
    val got = run(edges, nodes, 3)
    assert(got === reference(edges, nodes, 3))
    assert(got(1L) === 1L && got(2L) === got(1L) && got(3L) === got(1L))
    assert(got(11L) === got(12L)) // the far clique stays one community
    assert(got(99L) === 99L) // isolated node keeps its own label
  }

  test("LPA ≡ reference on a randomized directed graph, any partitioning") {
    val rnd = new scala.util.Random(7)
    val nodes = (1L to 40L).toSeq
    val edges = (1 to 160).map(_ =>
      (nodes(rnd.nextInt(40)), nodes(rnd.nextInt(40)))).filter(e => e._1 != e._2)
    val want = reference(edges, nodes, 3)
    assert(run(edges, nodes, 3) === want)
    // repartitioned input must give the identical answer
    val skewed = LabelProp.run(edges.toDF("src", "dst").repartition(13),
        nodes.toDF("id").repartition(3), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(skewed === want)
  }
}
