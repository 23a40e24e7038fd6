package graft

import graft.ops.Cooccurrence

/** Co-occurrence projection goldens: pair counts, edge dedup, and the
  * stop-hub drop (dropped, not truncated). */
class CooccurrenceSpec extends SparkSpec {

  import spark.implicits._

  test("pair counts over deduped edges; hot hubs drop entirely") {
    val edges = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"), (2L, "a"), // duplicate edge counts once
      (3L, "a"), (3L, "b"), (3L, "c"), (3L, "d") // degree 4 > cap 3 → dropped
    ).toDF("hub", "item")
    val out = Cooccurrence.project(edges, maxDegree = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      ("a", "b") -> 2L, ("a", "c") -> 1L, ("b", "c") -> 1L))
    val capped = Cooccurrence.project(edges, maxDegree = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // hubs 1 and 3 dropped: only hub 2's single pair remains
    assert(capped === Map(("a", "b") -> 1L))
  }

  test("randomized parity with a driver-side replay") {
    val rnd = new scala.util.Random(97L)
    val edges = (1 to 400).map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(12).toLong))
    val got = Cooccurrence.project(edges.toDF("hub", "item"), maxDegree = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val dedup = edges.distinct
    val keptHubs = dedup.groupBy(_._1).filter(_._2.size <= 6).keySet
    val want = dedup.filter(e => keptHubs(e._1)).groupBy(_._1).toSeq
      .flatMap { case (_, es) =>
        val items = es.map(_._2).sorted
        for (i <- items.indices; j <- (i + 1) until items.size if items(i) != items(j))
          yield (items(i), items(j))
      }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got === want)
  }
}
