package graft

import org.apache.spark.sql.functions._
import graft.ops.Triangles

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def count(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNode(pairs.toDF("id_a", "id_b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("hand graphs: triangle, square, K4, pendant") {
    // a triangle with a pendant edge
    assert(count(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // a 4-cycle has no triangles
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))) === Map.empty)
    // K4: 4 triangles, each node in 3
    assert(count(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))) ===
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("matches a naive in-driver enumeration on a random graph with a hub") {
    val rnd = new scala.util.Random(31)
    // a hub (node 0) adjacent to many nodes + random edges: exercises
    // exactly the skew the degree-ordering exists for
    val raw = (1L to 25L).map(v => (0L, v)) ++
      (1 to 120).map(_ => (rnd.nextInt(26).toLong, rnd.nextInt(26).toLong))
    val pairs = raw.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val adj = pairs.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .map { case (k, es) => k -> es.map(_._2).toSet }
    val naive = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      (a, b) <- pairs
      c <- adj(a) if c > b && adj(b).contains(c)
    } { naive(a) += 1; naive(b) += 1; naive(c) += 1 }
    assert(count(pairs) === naive.toMap)
    assert(naive.nonEmpty)
  }

  test("localClustering: triangle+pendant goldens, non-triangle nodes present at 0") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val got = graft.ops.Triangles.localClustering(pairs).collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("degree"), r.getAs[Long]("n_triangles"),
          r.getAs[Long]("lcc_bp")))).toMap
    assert(got === Map(
      1L -> ((2L, 1L, 10000L)), // its two neighbors are connected
      2L -> ((2L, 1L, 10000L)),
      3L -> ((3L, 1L, 3333L)),  // 1 of C(3,2)=3 neighbor pairs closed
      4L -> ((1L, 0L, 0L))))    // degree-1: defined as 0
  }
}
