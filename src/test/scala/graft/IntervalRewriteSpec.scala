package graft

import org.apache.spark.sql.functions._

/** The interval-join OPTIMIZER rewrite: a plain relational keyed
  * overlap join plans as the native operator, answers are exactly the
  * relational answers (incl. reversed intervals), residual conjuncts
  * survive, and non-matching shapes (strict bounds, no key, hints,
  * engine-internal underscore keys) are left alone. */
class IntervalRewriteSpec extends SparkSpec {

  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  /** Reference semantics: the nested-loop relational answer. */
  private def naive(a: Seq[(Long, Long, Long, Long)],
      b: Seq[(Long, Long, Long, Long)]): Set[(Long, Long)] =
    (for {
      (aid, k1, s, e) <- a
      (bid, k2, s2, e2) <- b
      if k1 == k2 && s <= e2 && s2 <= e
    } yield (aid, bid)).toSet

  private val aRows = Seq(
    (1L, 5L, 10L, 20L), (2L, 5L, 30L, 40L), (3L, 6L, 10L, 20L),
    (4L, 5L, 50L, 45L) // REVERSED: relational predicate still evaluated
  )
  private val bRows = Seq(
    (11L, 5L, 15L, 35L), (12L, 5L, 41L, 60L), (13L, 6L, 21L, 25L),
    (14L, 5L, 44L, 52L) // matches reversed a4: 50<=52 && 44<=45
  )

  test("relational overlap join plans as the native operator, answers preserved " +
      "(incl. reversed intervals)") {
    val a = aRows.toDF("aid", "k", "s", "e")
    val b = bRows.toDF("bid", "k2", "s2", "e2")
    val df = a.join(b, $"k" === $"k2" && $"s" <= $"e2" && $"s2" <= $"e")
    val plan = planOf(df)
    assert(plan.contains("IntervalJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"), plan)
    val got = df.select($"aid", $"bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === naive(aRows, bRows))
    assert(got.contains((4L, 14L)), "reversed-interval match must survive")
  }

  test("residual conjuncts stay as a filter on top; point probes rewrite too") {
    val a = aRows.toDF("aid", "k", "s", "e")
    val b = bRows.toDF("bid", "k2", "s2", "e2")
    val withResidual = a.join(b,
      $"k" === $"k2" && $"s" <= $"e2" && $"s2" <= $"e" && $"aid" =!= $"bid" - 10L)
    assert(planOf(withResidual).contains("IntervalJoin"))
    val got = withResidual.select($"aid", $"bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === naive(aRows, bRows).filterNot { case (x, y) => x == y - 10L })
    // point-in-interval: p <= e2 && s2 <= p (p plays both bound roles)
    val pts = Seq((1L, 5L, 16L), (2L, 5L, 70L), (3L, 6L, 22L)).toDF("pid", "k", "p")
    val probe = pts.join(b, $"k" === $"k2" && $"p" <= $"e2" && $"s2" <= $"p")
    assert(planOf(probe).contains("IntervalJoin"), planOf(probe))
    val gotP = probe.select($"pid", $"bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotP === Set((1L, 11L), (3L, 13L)))
  }

  test("strict bounds rewrite: relaxed node + strictness residual, exact answers") {
    val a = aRows.toDF("aid", "k", "s", "e")
    val b = bRows.toDF("bid", "k2", "s2", "e2")
    val strict = a.join(b, $"k" === $"k2" && $"s" < $"e2" && $"s2" <= $"e")
    val plan = planOf(strict)
    assert(plan.contains("IntervalJoin"), plan)
    val got = strict.select($"aid", $"bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (aid, k1, s, e) <- aRows; (bid, k2, s2, e2) <- bRows
      if k1 == k2 && s < e2 && s2 <= e
    } yield (aid, bid)).toSet
    assert(got === want)
    // boundary pair must drop: strict inequality at s == e2
    val both = a.join(b, $"k" === $"k2" && $"s" < $"e2" && $"s2" < $"e")
    assert(planOf(both).contains("IntervalJoin"), planOf(both))
    val g2 = both.select($"aid", $"bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(g2 === (for {
      (aid, k1, s, e) <- aRows; (bid, k2, s2, e2) <- bRows
      if k1 == k2 && s < e2 && s2 < e
    } yield (aid, bid)).toSet)
  }

  test("band join (attribute ± literal bounds) rewrites with working-column " +
      "projects, answers exact") {
    val a = Seq((1L, 5L, 100L), (2L, 5L, 200L), (3L, 6L, 150L), (4L, 5L, 310L))
      .toDF("aid", "k", "ts")
    val b = Seq((11L, 5L, 110L), (12L, 5L, 305L), (13L, 6L, 149L), (14L, 5L, 900L))
      .toDF("bid", "k2", "ts2")
    // a.ts BETWEEN b.ts2 - 15 AND b.ts2 + 15 — the canonical band spelling
    val band = a.join(b,
      $"k" === $"k2" && $"ts" >= $"ts2" - 15L && $"ts" <= $"ts2" + 15L)
    val plan = planOf(band)
    assert(plan.contains("IntervalJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"), plan)
    val got = band.select($"aid", $"bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 11L), (3L, 13L), (4L, 12L)))
    // schema is exactly the original join output — working cols dropped
    assert(band.columns.toSeq === Seq("aid", "k", "ts", "bid", "k2", "ts2"))
    // randomized parity on the band shape
    val rnd = new scala.util.Random(31)
    def mk(n: Int, base: Long) = (1 to n).map(i =>
      (base + i, rnd.nextInt(4).toLong, rnd.nextInt(500).toLong))
    val l = mk(200, 0L); val r = mk(200, 1000L)
    val df = l.toDF("aid", "k", "ts").join(r.toDF("bid", "k2", "ts2"),
      $"k" === $"k2" && $"ts" >= $"ts2" - 7L && $"ts" <= $"ts2" + 7L)
    assert(planOf(df).contains("IntervalJoin"), planOf(df))
    val gotR = df.select($"aid", $"bid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val wantR = (for {
      (aid, k1, t) <- l; (bid, k2, t2) <- r
      if k1 == k2 && t >= t2 - 7L && t <= t2 + 7L
    } yield (aid, bid)).toSet
    assert(gotR === wantR && gotR.nonEmpty)
  }

  test("non-matching shapes are untouched: keyless, hinted, " +
      "underscore-internal keys, float/double equi keys") {
    val a = aRows.toDF("aid", "k", "s", "e")
    val b = bRows.toDF("bid", "k2", "s2", "e2")
    // no equi key -> no clustered distribution -> no rewrite
    val keyless = a.join(b, $"s" <= $"e2" && $"s2" <= $"e")
    assert(!planOf(keyless).contains("IntervalJoin"), planOf(keyless))
    // an explicit hint states a physical preference; the rule defers
    val hinted = a.join(broadcast(b), $"k" === $"k2" && $"s" <= $"e2" && $"s2" <= $"e")
    assert(!planOf(hinted).contains("IntervalJoin"), planOf(hinted))
    assert(planOf(hinted).contains("BroadcastHashJoin"))
    // engine-internal underscore keys (the composed bucket operators)
    val au = a.withColumnRenamed("k", "_b")
    val bu = b.withColumnRenamed("k2", "_b2")
    val internal = au.join(bu, $"_b" === $"_b2" && $"s" <= $"e2" && $"s2" <= $"e")
    assert(!planOf(internal).contains("IntervalJoin"), planOf(internal))
    // float/double keys keep SQL EqualTo semantics (-0.0 == 0.0, NaN
    // normalization) only through the plain join — the rule must defer
    val af = Seq((1L, 0.0, 10L, 20L), (2L, -0.0, 30L, 40L)).toDF("aid", "kf", "s", "e")
    val bf = Seq((11L, -0.0, 15L, 35L)).toDF("bid", "kf2", "s2", "e2")
    val fjoin = af.join(bf, $"kf" === $"kf2" && $"s" <= $"e2" && $"s2" <= $"e")
    assert(!planOf(fjoin).contains("IntervalJoin"), planOf(fjoin))
    // and the answer keeps -0.0 == 0.0: both a-rows match
    assert(fjoin.select($"aid").collect().map(_.getLong(0)).toSet === Set(1L, 2L))
  }

  test("SQL form rewrites; randomized parity against the nested-loop answer") {
    val rnd = new scala.util.Random(29)
    def mk(n: Int, base: Long) = (1 to n).map { i =>
      val s = rnd.nextInt(300).toLong
      // ~10% reversed intervals keep the relational-semantics path honest
      val len = rnd.nextInt(40).toLong - 4L
      (base + i, rnd.nextInt(5).toLong, s, s + len)
    }
    val l = mk(250, 0L); val r = mk(250, 1000L)
    l.toDF("aid", "k", "s", "e").createOrReplaceTempView("ivl_l")
    r.toDF("bid", "k2", "s2", "e2").createOrReplaceTempView("ivl_r")
    val df = spark.sql(
      """SELECT aid, bid FROM ivl_l JOIN ivl_r
        |ON k = k2 AND s <= e2 AND s2 <= e""".stripMargin)
    assert(planOf(df).contains("IntervalJoin"), planOf(df))
    val got = df.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === naive(l, r))
    assert(got.nonEmpty)
  }
}
