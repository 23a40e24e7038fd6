package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.plans.AsofJoinNative

/** The native (custom LogicalPlan + Strategy + SparkPlan) as-of join:
  * exact parity with the composed union+window formulation on every edge
  * the operator documents, plan shape (merge exec, no window, one
  * exchange per side), and self-join alias safety. */
class AsofNativeSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val trades = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00"), 1.0),
    (2L, 10L, ts("2024-01-01 10:05:00"), 2.0),
    (3L, 10L, ts("2024-01-01 09:00:00"), 3.0), // before every quote
    (4L, 20L, ts("2024-01-01 10:00:00"), 4.0), // key with no quotes
    (5L, 30L, ts("2024-01-01 10:00:00"), 5.0)  // equal-ts match
  ).toDF("event_id", "user_id", "ts", "value")

  private val quotes = Seq(
    (10L, ts("2024-01-01 09:30:00"), 100.0),
    (10L, ts("2024-01-01 10:00:00"), 101.0), // ties trade 1 exactly
    (10L, ts("2024-01-01 10:00:00"), 102.0), // dup (key, ts): greatest wins
    (10L, ts("2024-01-01 10:04:00"), 103.0),
    (30L, ts("2024-01-01 10:00:00"), 300.0)
  ).toDF("user_id", "ts", "value")

  test("native exec ≡ union+window asofBackward on ties, dups, and misses") {
    val a = AsofJoinNative.asofBackward(trades, quotes, Seq("user_id"), "ts",
      rightPrefix = "q_").orderBy($"event_id").collect()
    val b = graft.ops.AsofJoin.asofBackward(trades, quotes, Seq("user_id"),
      "ts", rightPrefix = "q_").orderBy($"event_id").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    // spot-check the documented picks
    val byId = a.map(r => r.getLong(0) ->
      (Option(r.get(4)).map(_.toString), Option(r.get(5)))).toMap
    assert(byId(1L)._2 === Some(102.0)) // equal ts matches, greatest payload
    assert(byId(2L)._2 === Some(103.0))
    assert(byId(3L)._2 === None)        // before every quote
    assert(byId(4L)._2 === None)        // key never quoted
    assert(byId(5L)._2 === Some(300.0))
  }

  test("parity holds on randomized feeds (incl. null right keys)") {
    val rnd = new scala.util.Random(7)
    val l = (1 to 300).map(i => (i.toLong, (rnd.nextInt(8) + 1).toLong,
      ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"), rnd.nextInt(100).toDouble))
      .toDF("event_id", "user_id", "ts", "value")
    val r = (1 to 200).map { i =>
      val k: java.lang.Long = if (rnd.nextInt(10) == 0) null
        else (rnd.nextInt(8) + 1).toLong
      (k, ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"), rnd.nextInt(100).toDouble)
    }.toDF("user_id", "ts", "value")
    val a = AsofJoinNative.asofBackward(l, r, Seq("user_id"), "ts")
      .orderBy($"event_id").collect().map(_.toSeq).toSeq
    val b = graft.ops.AsofJoin.asofBackward(l, r, Seq("user_id"), "ts")
      .orderBy($"event_id").collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("plan: AsofJoinExec merge operator, no Window, one exchange per side") {
    val df = AsofJoinNative.asofBackward(trades, quotes, Seq("user_id"), "ts",
      broadcastRight = Some(false))
    df.collect()
    // under AQE the string carries Final + Initial plans; pin the final
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("AsofJoin"), plan)
    assert(!plan.contains("Window"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 2, plan)
  }

  test("broadcast exec ≡ merge exec on ties, dups, misses, and randomized feeds") {
    val a = AsofJoinNative.asofBackward(trades, quotes, Seq("user_id"), "ts",
        rightPrefix = "q_", broadcastRight = Some(true))
      .orderBy($"event_id").collect().map(_.toSeq).toSeq
    val b = AsofJoinNative.asofBackward(trades, quotes, Seq("user_id"), "ts",
        rightPrefix = "q_", broadcastRight = Some(false))
      .orderBy($"event_id").collect().map(_.toSeq).toSeq
    assert(a === b)
    val rnd = new scala.util.Random(11)
    val l = (1 to 300).map(i => (i.toLong, (rnd.nextInt(8) + 1).toLong,
      ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"), rnd.nextInt(100).toDouble))
      .toDF("event_id", "user_id", "ts", "value")
    val r = (1 to 200).map { i =>
      val k: java.lang.Long = if (rnd.nextInt(10) == 0) null
        else (rnd.nextInt(8) + 1).toLong
      (k, ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"), rnd.nextInt(100).toDouble)
    }.toDF("user_id", "ts", "value")
    val ba = AsofJoinNative.asofBackward(l, r, Seq("user_id"), "ts",
        broadcastRight = Some(true))
      .orderBy($"event_id").collect().map(_.toSeq).toSeq
    val bb = graft.ops.AsofJoin.asofBackward(l, r, Seq("user_id"), "ts")
      .orderBy($"event_id").collect().map(_.toSeq).toSeq
    assert(ba === bb)
  }

  test("broadcast plan: BroadcastExchange on the build side, ZERO exchanges " +
      "and ZERO sorts on the probe side; small stats pick broadcast unforced") {
    val df = AsofJoinNative.asofBackward(trades, quotes, Seq("user_id"), "ts",
      broadcastRight = Some(true))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastAsofJoin"), plan)
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("Sort "), plan) // the probe side is untouched
    // stats path: a tiny in-memory build side is under the threshold, so
    // the strategy picks broadcast WITHOUT the hint
    val auto = AsofJoinNative.asofBackward(trades, quotes, Seq("user_id"), "ts")
    auto.collect()
    val autoPlan = auto.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(autoPlan.contains("BroadcastAsofJoin"), autoPlan)
  }

  test("self-join safety: both sides carved from the SAME frame") {
    val ev = trades.select($"event_id", $"user_id", $"ts", $"value")
    val left = ev.where($"value" >= 2.0)
    val right = ev.where($"value" < 2.0).select($"user_id", $"ts", $"value")
    val out = AsofJoinNative.asofBackward(left, right, Seq("user_id"), "ts")
      .orderBy($"event_id").collect()
    // only the user-10 right row (value 1.0, 10:00) exists; trade 2
    // (10:05) matches it, trade 3 (09:00) precedes it
    val m = out.map(r => r.getLong(0) -> Option(r.get(5))).toMap
    assert(m(2L) === Some(1.0) && m(3L) === None && m(4L) === None)
  }
}
