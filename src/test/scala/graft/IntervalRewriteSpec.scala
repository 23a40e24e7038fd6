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

  test("non-matching shapes are untouched: strict bounds, keyless, hinted, " +
      "underscore-internal keys") {
    val a = aRows.toDF("aid", "k", "s", "e")
    val b = bRows.toDF("bid", "k2", "s2", "e2")
    // strict inequality is NOT the closed-overlap pattern
    val strict = a.join(b, $"k" === $"k2" && $"s" < $"e2" && $"s2" <= $"e")
    assert(!planOf(strict).contains("IntervalJoin"), planOf(strict))
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
