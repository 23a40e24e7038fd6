package graft

import java.sql.Timestamp

import graft.ops.AsofJoin
import org.apache.spark.sql.functions._

/** As-of join goldens: boundary semantics (equal-ts match, no-prior
  * null), per-key isolation, null-key right-row exclusion, and the
  * no-candidate-explosion plan shape. */
class AsofJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("backward as-of: latest at-or-before match, nulls when no prior row") {
    val quotes = Seq(
      (1L, ts(10), 100.0),
      (1L, ts(20), 101.0),
      (2L, ts(15), 200.0))
      .toDF("k", "ts", "px")
    val trades = Seq(
      (1L, ts(5), "t-early"),   // before any quote → null
      (1L, ts(10), "t-equal"),  // equal ts matches
      (1L, ts(25), "t-late"),   // latest prior is 20/101.0
      (2L, ts(30), "t-other"),  // key isolation: matches key-2 quote only
      (3L, ts(50), "t-nokey"))  // key with no quotes at all → null
      .toDF("k", "ts", "tag")
    val out = AsofJoin.asofBackward(trades, quotes, Seq("k"), "ts")
      .collect().map(r => r.getAs[String]("tag") ->
        (Option(r.getAs[Timestamp]("r_ts")).map(_.getTime / 1000),
          Option(r.getAs[Any]("r_px")))).toMap
    assert(out("t-early") === ((None, None)))
    assert(out("t-equal") === ((Some(10L), Some(100.0))))
    assert(out("t-late") === ((Some(20L), Some(101.0))))
    assert(out("t-other") === ((Some(15L), Some(200.0))))
    assert(out("t-nokey") === ((None, None)))
  }

  test("null-keyed right rows never match; null-keyed left rows pass through unmatched") {
    val right = Seq((Some(1L), ts(1), 9.0), (None, ts(2), 8.0))
      .toDF("k", "ts", "px")
    val left = Seq((Some(1L), ts(5), "a"), (None, ts(5), "b"))
      .toDF("k", "ts", "tag")
    val out = AsofJoin.asofBackward(left, right, Seq("k"), "ts")
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[Any]("r_px"))).toMap
    assert(out("a") === Some(9.0))
    assert(out("b") === None) // SQL equi-join semantics: null != null
  }

  test("forward as-of: earliest at-or-after match, nulls when no later row") {
    val quotes = Seq(
      (1L, ts(10), 100.0),
      (1L, ts(20), 101.0),
      (2L, ts(15), 200.0))
      .toDF("k", "ts", "px")
    val trades = Seq(
      (1L, ts(5), "t-early"),   // next quote is 10/100.0
      (1L, ts(10), "t-equal"),  // equal ts matches forward too
      (1L, ts(15), "t-mid"),    // next is 20/101.0
      (1L, ts(25), "t-late"),   // after every quote → null
      (2L, ts(10), "t-other"),  // key isolation
      (3L, ts(50), "t-nokey"))
      .toDF("k", "ts", "tag")
    val out = AsofJoin.asofForward(trades, quotes, Seq("k"), "ts")
      .collect().map(r => r.getAs[String]("tag") ->
        (Option(r.getAs[Timestamp]("r_ts")).map(_.getTime / 1000),
          Option(r.getAs[Any]("r_px")))).toMap
    assert(out("t-early") === ((Some(10L), Some(100.0))))
    assert(out("t-equal") === ((Some(10L), Some(100.0))))
    assert(out("t-mid") === ((Some(20L), Some(101.0))))
    assert(out("t-late") === ((None, None)))
    assert(out("t-other") === ((Some(15L), Some(200.0))))
    assert(out("t-nokey") === ((None, None)))
  }

  test("forward as-of mirrors backward under time reversal") {
    // forward(l, r) at ts ≡ backward(l, r) at negated ts — an
    // independent derivation of every match on a randomized feed
    val rnd = new scala.util.Random(11)
    val right = (1 to 120).map(_ =>
      (rnd.nextInt(4).toLong, ts(rnd.nextInt(60).toLong), rnd.nextInt(1000).toDouble))
    val left = (1 to 80).map(i =>
      (rnd.nextInt(5).toLong, ts(rnd.nextInt(70).toLong), s"t$i"))
    // de-dup (k, ts) on the right: the greatest-payload tie rule is
    // shared, but reversal flips which struct is "greatest"
    val rightDf = right.groupBy(r => (r._1, r._2)).values.map(_.head).toSeq
      .toDF("k", "ts", "px")
    val leftDf = left.toDF("k", "ts", "tag")
    val fwd = AsofJoin.asofForward(leftDf, rightDf, Seq("k"), "ts")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Timestamp]("ts"),
        r.getAs[String]("tag")) -> Option(r.getAs[Any]("r_px"))).toMap
    val bwd = AsofJoin.asofBackward(
        leftDf.withColumn("ts", -unix_micros($"ts")),
        rightDf.withColumn("ts", -unix_micros($"ts")), Seq("k"), "ts")
      .collect().map(r => r.getAs[String]("tag") -> Option(r.getAs[Any]("r_px"))).toMap
    fwd.foreach { case ((_, _, tag), px) =>
      assert(px === bwd(tag), s"tag $tag")
    }
    assert(fwd.nonEmpty && fwd.values.exists(_.nonEmpty))
  }

  test("asofNearest: nearer side wins, ties go backward, gap bounds, equal-ts exact") {
    val left = Seq(
      (1L, 10L, ts(100)), // prev at 90 (Δ10) vs next at 130 (Δ30) → prev
      (1L, 11L, ts(128)), // prev at 90 (Δ38) vs next at 130 (Δ2) → next
      (1L, 12L, ts(150)), // prev 130 (Δ20) vs next 170 (Δ20): tie → prev
      (1L, 13L, ts(500)), // nothing within ±60 s → null
      (2L, 20L, ts(40)), // key isolation: only key-2 rights considered
      (3L, 30L, ts(55)) // equal-ts right → distance 0
    ).toDF("k", "lid", "ts")
    val right = Seq(
      (1L, 90L, ts(90)), (1L, 91L, ts(130)), (1L, 92L, ts(170)),
      (2L, 93L, ts(39)), (3L, 94L, ts(55)))
      .toDF("k", "rid", "ts")
    val out = AsofJoin.asofNearest(left, right, Seq("k"), "ts", 60L)
      .collect().map(r => r.getLong(1) -> Option(r.get(4)).map(_.asInstanceOf[Long]))
      .toMap
    assert(out === Map(10L -> Some(90L), 11L -> Some(91L), 12L -> Some(91L),
      13L -> None, 20L -> Some(93L), 30L -> Some(94L)))
  }

  test("asofNearest plan: still one keyed exchange, zero join operators") {
    val left = spark.range(50).select($"id".as("k"),
      timestamp_micros($"id" * 1000000).as("ts"), $"id".as("v"))
    val right = spark.range(50).select(($"id" % 5).as("k"),
      timestamp_micros($"id" * 700000).as("ts"), $"id".as("px"))
    val plan = AsofJoin.asofNearest(left, right, Seq("k"), "ts", 30L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan)
  }

  test("plan: one keyed exchange, no join operator, no candidate pairs") {
    val left = spark.range(100).select($"id".as("k"),
      timestamp_micros($"id" * 1000000).as("ts"), $"id".as("v"))
    val right = spark.range(100).select(($"id" % 10).as("k"),
      timestamp_micros($"id" * 500000).as("ts"), $"id".as("px"))
    val plan = AsofJoin.asofBackward(left, right, Seq("k"), "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"the as-of must be a window carry-forward, not a join:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
      s"expected exactly one keyed shuffle:\n$plan")
  }
}
