package graft

import org.apache.spark.sql.functions._
import graft.ops.PageRank

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], nodes: Seq[Long], k: Int) =
    PageRank.run(edges.toDF("src", "dst"), nodes.toDF("id"), iterations = k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Independent in-driver transcription of the integer contract. */
  private def reference(edges: Seq[(Long, Long)], nodes: Seq[Long], k: Int,
      scale: Long = 1000000000L, dampBp: Long = 8500L): Map[Long, Long] = {
    val n = nodes.distinct.size
    val r0 = scale / n
    val base = ((10000L - dampBp) * r0) / 10000L
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = nodes.distinct.map(_ -> r0).toMap
    for (_ <- 1 to k) {
      val s = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (src, _) => r(src) / deg(src) }.sum
      }
      r = nodes.distinct.map(v => v -> (base + dampBp * s.getOrElse(v, 0L) / 10000L)).toMap
    }
    r
  }

  test("matches the in-driver integer reference on a star + cycle + isolate") {
    // hub 1 <-> spokes 2,3,4 (undirected), cycle 5->6->7->5, isolate 8
    val undirected = Seq((1L, 2L), (1L, 3L), (1L, 4L))
    val edges = undirected ++ undirected.map(_.swap) ++
      Seq((5L, 6L), (6L, 7L), (7L, 5L))
    val nodes = (1L to 8L).toSeq
    val got = run(edges, nodes, 4)
    assert(got === reference(edges, nodes, 4))
    // structure: the hub out-ranks every spoke; spokes are symmetric
    assert(got(1L) > got(2L) && got(2L) === got(3L) && got(3L) === got(4L))
    // a 3-cycle preserves each node's rank at the stationary value
    assert(got(5L) === got(6L) && got(6L) === got(7L))
    // the isolate holds exactly the teleport base
    val base = ((10000L - 8500L) * (1000000000L / 8)) / 10000L
    assert(got(8L) === base)
  }

  test("deterministic across reruns and partitionings") {
    val rnd = new scala.util.Random(23)
    val edges = (1 to 300).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)).filter(e => e._1 != e._2)
    val nodes = (0L until 40L).toSeq
    val a = run(edges, nodes, 3)
    val b = PageRank.run(edges.toDF("src", "dst").repartition(7),
        nodes.toDF("id").repartition(3), iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    assert(a === reference(edges, nodes, 3))
  }
}
