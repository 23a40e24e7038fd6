package graft

import java.sql.Timestamp

import graft.plans.IntervalJoinNative
import org.apache.spark.sql.functions._

/** The native keyed interval-overlap join (custom LogicalPlan +
  * Strategy + merge-sweep SparkPlan): boundary goldens (touching
  * endpoints, containment, reversed/null intervals, key isolation),
  * randomized parity against the naive relational overlap join, plan
  * shape (sweep exec, no BroadcastNestedLoop/Cartesian, one exchange
  * per side), and self-join alias safety. */
class IntervalNativeSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Run the join through BOTH physical shapes (co-partitioned merge
    * sweep and broadcast index probe) and assert they agree; returns
    * the merge result. */
  private def bothPaths(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame, keys: Seq[String],
      sL: String, eL: String, sR: String, eR: String)
      : Array[org.apache.spark.sql.Row] = {
    val m = IntervalJoinNative.overlapJoin(a, b, keys, sL, eL, sR, eR,
      broadcastRight = Some(false))
    val bc = IntervalJoinNative.overlapJoin(a, b, keys, sL, eL, sR, eR,
      broadcastRight = Some(true))
    val cols = m.columns.map(org.apache.spark.sql.functions.col).toIndexedSeq
    val mr = m.select(cols: _*).collect()
    val br = bc.select(cols: _*).collect()
    assert(mr.map(_.toSeq).sortBy(_.toString).toSeq ===
      br.map(_.toSeq).sortBy(_.toString).toSeq, "merge vs broadcast diverge")
    mr
  }

  test("boundary goldens: touching endpoints match, disjoint don't, key isolates") {
    val a = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:30:00")),
      (3L, 20L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"))
    ).toDF("aid", "k", "s", "e")
    val b = Seq(
      (101L, 10L, ts("2024-01-01 11:00:00"), ts("2024-01-01 11:30:00")), // touches a1's end
      (102L, 10L, ts("2024-01-01 09:00:00"), ts("2024-01-01 09:59:59")), // ends just before a1
      (103L, 10L, ts("2024-01-01 10:15:00"), ts("2024-01-01 10:20:00")), // contained in a1
      (104L, 20L, ts("2024-01-01 12:00:00"), ts("2024-01-01 13:00:00")), // other key, no overlap
      (105L, 30L, ts("2024-01-01 10:30:00"), ts("2024-01-01 10:45:00"))  // key nobody has
    ).toDF("bid", "k", "s2", "e2")
    val got = bothPaths(a, b, Seq("k"), "s", "e", "s2", "e2")
      .map(r => (r.getLong(0), r.getAs[Long]("r_bid"))).toSet
    assert(got === Set((1L, 101L), (1L, 103L)))
  }

  test("degenerate rows: reversed intervals and null keys/bounds never match") {
    val a = Seq(
      (1L, Some(10L), Some(ts("2024-01-01 10:00:00")), Some(ts("2024-01-01 09:00:00"))), // reversed
      (2L, None, Some(ts("2024-01-01 10:00:00")), Some(ts("2024-01-01 11:00:00"))),      // null key
      (3L, Some(10L), None, Some(ts("2024-01-01 11:00:00"))),                            // null start
      (4L, Some(10L), Some(ts("2024-01-01 10:00:00")), Some(ts("2024-01-01 11:00:00")))
    ).toDF("aid", "k", "s", "e")
    val b = Seq((9L, Some(10L), Some(ts("2024-01-01 10:00:00")),
      Some(ts("2024-01-01 12:00:00")))).toDF("bid", "k", "s2", "e2")
    val got = bothPaths(a, b, Seq("k"), "s", "e", "s2", "e2")
      .map(_.getLong(0)).toSet
    assert(got === Set(4L))
  }

  test("randomized parity with the naive relational overlap join") {
    val rnd = new scala.util.Random(43)
    def mk(n: Int, idBase: Long) = (1 to n).map { i =>
      val s = rnd.nextInt(500).toLong
      (idBase + i, rnd.nextInt(6).toLong, s, s + rnd.nextInt(60).toLong)
    }
    val a = mk(300, 0L).toDF("aid", "k", "s", "e")
    val b = mk(300, 1000L).toDF("bid", "k", "s2", "e2")
    val got = bothPaths(a, b, Seq("k"), "s", "e", "s2", "e2")
      .map(r => (r.getLong(0), r.getAs[Long]("r_bid"))).sorted
    val want = a.join(b.withColumnRenamed("k", "k2"),
        $"k" === $"k2" && $"s" <= $"e2" && $"s2" <= $"e")
      .select($"aid", $"bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got === want)
    assert(want.nonEmpty)
    // no duplicate pairs from the sweep
    assert(got.distinct.length === got.length)
  }

  test("plan: IntervalJoinExec sweep, no nested loop or cartesian, one exchange per side") {
    val ev = Tables.load(spark, sfDir, "events")
    val a = ev.where($"event_type" === "error")
      .select($"event_id".as("aid"), $"user_id", $"ts".as("s"),
        ($"ts" + expr("INTERVAL 30 MINUTES")).as("e"))
    val b = ev.where($"event_type" === "click")
      .select($"event_id".as("bid"), $"user_id", $"ts".as("s2"),
        ($"ts" + expr("INTERVAL 15 MINUTES")).as("e2"))
    val df = IntervalJoinNative.overlapJoin(a, b, Seq("user_id"),
      "s", "e", "s2", "e2", broadcastRight = Some(false))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("IntervalJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 2, plan)
    assert(df.count() > 0)
  }

  test("self-join safety: both sides carved from the SAME frame") {
    val ev = Seq(
      (1L, 5L, 10L, 20L), (2L, 5L, 15L, 25L), (3L, 5L, 30L, 40L)
    ).toDF("id", "k", "s", "e")
    val got = bothPaths(
        ev.select($"id".as("aid"), $"k", $"s", $"e"),
        ev.select($"id".as("bid"), $"k", ($"s" + 1L).as("s2"), ($"e" + 1L).as("e2")),
        Seq("k"), "s", "e", "s2", "e2")
      .map(r => (r.getLong(0), r.getAs[Long]("r_bid"))).toSet
    // intervals: a=(10,20),(15,25),(30,40); b=(11,21),(16,26),(31,41)
    assert(got === Set((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("broadcast plan: BroadcastExchange build side, probe side untouched; " +
      "small stats pick broadcast unforced") {
    val a = Seq((1L, 5L, 10L, 20L), (2L, 5L, 30L, 40L)).toDF("aid", "k", "s", "e")
    val b = Seq((9L, 5L, 15L, 35L)).toDF("bid", "k", "s2", "e2")
    val df = IntervalJoinNative.overlapJoin(a, b, Seq("k"),
      "s", "e", "s2", "e2", broadcastRight = Some(true))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastIntervalJoin"), plan)
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("Sort "), plan)
    // stats path: a tiny build side picks broadcast without the hint
    val auto = IntervalJoinNative.overlapJoin(a, b, Seq("k"),
      "s", "e", "s2", "e2")
    auto.collect()
    val autoPlan = auto.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(autoPlan.contains("BroadcastIntervalJoin"), autoPlan)
  }
}
