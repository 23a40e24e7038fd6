package graft

import java.sql.Timestamp

import graft.ops.RangeJoin
import org.apache.spark.sql.functions._

/** Range-join goldens: equivalence to the naive inequality join on
  * randomized data (completeness + duplicate-freeness of the bucket
  * formulation), inclusive bounds, inverted-interval drop, and the
  * hash-join (never nested-loop) plan shape. */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("bucketed join ≡ naive inequality join on randomized intervals") {
    val rnd = new scala.util.Random(17L)
    val points = (1L to 300L).map(i => (i, ts(rnd.nextInt(5000).toLong)))
      .toDF("p_id", "p_ts")
    val intervals = (1L to 60L).map { i =>
      val s = rnd.nextInt(5000).toLong
      (i, ts(s), ts(s + rnd.nextInt(900).toLong)) // 0..15 min wide
    }.toDF("i_id", "i_start", "i_end")
    // bucket width deliberately SMALLER than many intervals so the
    // multi-bucket explode path is exercised
    val got = RangeJoin.pointInInterval(points, intervals,
        "p_ts", "i_start", "i_end", bucketSeconds = 120L)
      .select($"p_id", $"i_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = points.crossJoin(intervals)
      .where($"p_ts" >= $"i_start" && $"p_ts" <= $"i_end")
      .select($"p_id", $"i_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sorted.toSeq === want.sorted.toSeq) // incl. multiplicity
    assert(got.length === got.distinct.length, "bucket meet must be unique")
    assert(want.nonEmpty)
  }

  test("bounds are inclusive; inverted intervals are dropped") {
    val points = Seq((1L, ts(100)), (2L, ts(200)), (3L, ts(150)))
      .toDF("p_id", "p_ts")
    val intervals = Seq(
      (10L, ts(100), ts(200)),  // matches all three (both bounds land)
      (11L, ts(300), ts(250)))  // inverted → dropped, not mis-bucketed
      .toDF("i_id", "i_start", "i_end")
    val got = RangeJoin.pointInInterval(points, intervals,
        "p_ts", "i_start", "i_end", bucketSeconds = 30L)
      .select($"p_id", $"i_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (2L, 10L), (3L, 10L)))
  }

  test("plan: hash join on the bucket, never a nested loop or cartesian") {
    val points = spark.range(50).select($"id".as("p_id"),
      timestamp_micros($"id" * 60000000L).as("p_ts"))
    val intervals = spark.range(10).select($"id".as("i_id"),
      timestamp_micros($"id" * 300000000L).as("i_start"),
      timestamp_micros($"id" * 300000000L + 600000000L).as("i_end"))
    val plan = RangeJoin.pointInInterval(points, intervals,
      "p_ts", "i_start", "i_end").queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
    assert(plan.contains("HashJoin"), plan)
  }

  test("intervalOverlap ≡ naive overlap join on randomized intervals, duplicate-free") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // interval lengths straddle the bucket width (600 s): some fit in
    // one bucket, some span several — both dedup regimes exercised
    def mk(n: Int, tag: String) = (1 to n).map { i =>
      val s = rnd.nextInt(86400).toLong
      val len = (rnd.nextInt(1800) + 1).toLong
      (i.toLong, s, s + len)
    }.toDF(s"${tag}_id", s"${tag}_s", s"${tag}_e")
      .select(col(s"${tag}_id"),
        timestamp_micros(col(s"${tag}_s") * 1000000L).as(s"${tag}_start"),
        timestamp_micros(col(s"${tag}_e") * 1000000L).as(s"${tag}_end"))
    val (a, b) = (mk(120, "a"), mk(150, "b"))
    val got = RangeJoin.intervalOverlap(a, b, "a_start", "a_end",
        "b_start", "b_end", bucketSeconds = 600L)
      .select($"a_id", $"b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = a.join(b,
        col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
      .select($"a_id", $"b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === got.distinct.length, "pairs must be emitted once")
    assert(got.toSet === want.toSet)
    assert(got.length === want.length)
  }

  test("intervalOverlap plan: hash join on the bucket, never a nested loop") {
    import spark.implicits._
    val a = spark.range(10).select($"id".as("a_id"),
      timestamp_micros($"id" * 300000000L).as("a_start"),
      timestamp_micros($"id" * 300000000L + 60000000L).as("a_end"))
    val b = spark.range(10).select($"id".as("b_id"),
      timestamp_micros($"id" * 200000000L).as("b_start"),
      timestamp_micros($"id" * 200000000L + 90000000L).as("b_end"))
    val plan = RangeJoin.intervalOverlap(a, b, "a_start", "a_end",
      "b_start", "b_end").queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
    assert(plan.contains("HashJoin"), plan)
  }
}
