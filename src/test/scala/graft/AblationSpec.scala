package graft

import org.apache.spark.sql.functions._
import graft.ext.TextStats

/** Source-ablation identity: the query's closed-form loo_delta_q8 must
  * equal the LITERALLY recomputed corpus-mean change when the source is
  * dropped (driver-side exact BigInt replay on sf0.001). */
class AblationSpec extends SparkSpec {

  import spark.implicits._

  test("loo_delta_q8 equals the recomputed leave-one-out mean change") {
    val docs = Tables.load(spark, sfDir, "documents")
    val perDoc = TextStats.analyze(docs).select($"doc_id", $"quality_q4")
      .join(docs.select($"doc_id",
        coalesce($"source", lit("∅")).as("source")), "doc_id")
      .select($"source", $"quality_q4")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val bySrc = perDoc.groupBy(_._1).map { case (s, rs) =>
      s -> (rs.length.toLong, rs.map(_._2).sum)
    }
    val n = perDoc.length.toLong
    val t = perDoc.map(_._2).sum
    val got = graft.queries.ExtQueries.sourceAblation(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet === bySrc.keySet)
    bySrc.foreach { case (s, (ns, sums)) =>
      val (gn, gMean, gDelta) = got(s)
      assert(gn === ns)
      assert(gMean === sums / ns)
      // literal LOO: q8-scaled means as BigInt rationals, then the same
      // truncating division the engines use
      val expected =
        (BigInt(10000) * (BigInt(ns) * t - BigInt(n) * sums) /
          (BigInt(n) * (n - ns))).toLong
      assert(gDelta === expected, s"source $s")
      // sign sanity: positive delta <=> source mean below corpus mean
      assert((gDelta > 0) === (BigInt(sums) * n < BigInt(t) * ns) ||
        gDelta == 0)
    }
  }
}
