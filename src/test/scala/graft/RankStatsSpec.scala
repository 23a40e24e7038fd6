package graft

import graft.ops.RankStats
import org.apache.spark.sql.functions._

/** Exact-integer rank statistics against hand-computed goldens and the
  * closed-form extremes (perfect separation/association/trend), plus
  * the tie-handling cases where a naive implementation diverges. */
class RankStatsSpec extends SparkSpec {

  import spark.implicits._

  test("auc: perfect separation is 10000, reversed is 0, midrank ties exact") {
    // positives strictly above negatives
    val perfect = Seq(("g", false, 1), ("g", false, 2), ("g", true, 3),
      ("g", true, 4)).toDF("g", "pos", "x")
    val p = RankStats.auc(perfect, $"g", $"pos", $"x").collect().head
    assert(p.getAs[Long]("auc_bp") == 10000L)
    val reversed = RankStats.auc(
      perfect.withColumn("pos", !$"pos"), $"g", $"pos", $"x").collect().head
    assert(reversed.getAs[Long]("auc_bp") == 0L)
    // one tie straddling the classes: scores pos={1,2}, neg={2,3} —
    // of the 4 (pos, neg) pairs only the 2-vs-2 tie scores, at ½ →
    // AUC = 0.5/4 = 0.125
    val tied = Seq(("g", true, 1), ("g", true, 2), ("g", false, 2),
      ("g", false, 3)).toDF("g", "pos", "x")
    val t = RankStats.auc(tied, $"g", $"pos", $"x").collect().head
    assert(t.getAs[Long]("auc_bp") == 1250L)
    assert(t.getAs[Long]("n_pos") == 2L && t.getAs[Long]("n_neg") == 2L)
  }

  test("auc: single-class groups are dropped") {
    val df = Seq(("a", true, 1), ("a", true, 2), ("b", true, 1),
      ("b", false, 2)).toDF("g", "pos", "x")
    val got = RankStats.auc(df, $"g", $"pos", $"x").collect()
    assert(got.map(_.getString(0)).toSeq == Seq("b"))
  }

  test("gini: uniform is 0, single-holder approaches (n-1)/n, golden") {
    val uniform = Seq(("g", 5L, 1L), ("g", 5L, 2L), ("g", 5L, 3L), ("g", 5L, 4L))
      .toDF("g", "x", "t")
    assert(RankStats.gini(uniform, $"g", $"x", $"t")
      .collect().head.getAs[Long]("gini_bp") == 0L)
    // one holder has everything: gini = (n-1)/n = 0.75
    val single = Seq(("g", 0L, 1L), ("g", 0L, 2L), ("g", 0L, 3L), ("g", 40L, 4L))
      .toDF("g", "x", "t")
    assert(RankStats.gini(single, $"g", $"x", $"t")
      .collect().head.getAs[Long]("gini_bp") == 7500L)
    // hand-computed: values 1,2,3,4 ascending → G = 2*30/(4*10) - 5/4 = 1/4
    val hand = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 3L), ("g", 4L, 4L))
      .toDF("g", "x", "t")
    assert(RankStats.gini(hand, $"g", $"x", $"t")
      .collect().head.getAs[Long]("gini_bp") == 2500L)
  }

  test("gini: result is tie-order independent") {
    // equal values permute freely under the tie-break without moving G
    val a = Seq(("g", 2L, 9L), ("g", 2L, 1L), ("g", 6L, 5L)).toDF("g", "x", "t")
    val b = Seq(("g", 2L, 1L), ("g", 2L, 9L), ("g", 6L, 5L)).toDF("g", "x", "t")
    val ga = RankStats.gini(a, $"g", $"x", $"t").collect().head.getAs[Long]("gini_bp")
    val gb = RankStats.gini(b, $"g", $"x", $"t").collect().head.getAs[Long]("gini_bp")
    assert(ga == gb)
  }

  test("spearman: monotone is +-10000 exactly; sign tracks direction") {
    val up = Seq(("g", 1, 10), ("g", 2, 20), ("g", 3, 35), ("g", 4, 70))
      .toDF("g", "x", "y")
    assert(RankStats.spearman(up, $"g", $"x", $"y")
      .collect().head.getAs[Long]("rho2_bp") == 10000L)
    val down = Seq(("g", 1, 70), ("g", 2, 35), ("g", 3, 20), ("g", 4, 10))
      .toDF("g", "x", "y")
    assert(RankStats.spearman(down, $"g", $"x", $"y")
      .collect().head.getAs[Long]("rho2_bp") == -10000L)
  }

  test("spearman: constant column (zero variance) is dropped") {
    val df = Seq(("g", 1, 5), ("g", 2, 5), ("g", 3, 5)).toDF("g", "x", "y")
    assert(RankStats.spearman(df, $"g", $"x", $"y").collect().isEmpty)
  }

  test("spearman: ties via midranks, near-zero association stays small") {
    val df = Seq(("g", 1, 2), ("g", 1, 1), ("g", 2, 1), ("g", 2, 2),
      ("g", 3, 1), ("g", 3, 2)).toDF("g", "x", "y")
    val rho = RankStats.spearman(df, $"g", $"x", $"y")
      .collect().head.getAs[Long]("rho2_bp")
    assert(math.abs(rho) < 1000, s"expected near zero, got $rho")
  }

  test("spearman: bucketed distributed ranking == the single-window form " +
      "on random ties-heavy data") {
    // rankBuckets = 1 puts every row in bucket 0 — the window collapses
    // to partitionBy(g), i.e. the pre-r11 single-task-per-group form;
    // any bucket count must produce IDENTICAL midranks (equal values
    // share a bucket, offsets restore the global rank)
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map(i =>
      (s"g${i % 3}", rnd.nextInt(12), rnd.nextInt(40)))
    val df = rows.toDF("g", "x", "y")
    def run(b: Int) = RankStats.spearman(df, $"g", $"x", $"y", rankBuckets = b)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("rho2_bp")))).toMap
    val single = run(1)
    assert(single.keySet === Set("g0", "g1", "g2"))
    assert(run(7) === single)
    assert(run(256) === single)
    spark.catalog.clearCache()
  }

  test("auc / weightedMedian: bucketed prefix machinery == the " +
      "single-window form on random ties-heavy data") {
    // buckets = 1 collapses the (g, bucket) window to partitionBy(g) —
    // the pre-r11 whole-group-per-task form; any bucket count must
    // reproduce it exactly (ties share buckets, offsets restore ranks)
    val rnd = new scala.util.Random(11)
    val adf = (1 to 300).map(i =>
      (s"s${i % 4}", rnd.nextInt(30), rnd.nextBoolean()))
      .toDF("g", "x", "pos")
    def runAuc(b: Int) = RankStats.auc(adf, $"g", $"pos", $"x", rankBuckets = b)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("auc_bp")).toMap
    val auc1 = runAuc(1)
    assert(auc1.keySet === Set("s0", "s1", "s2", "s3"))
    assert(runAuc(8) === auc1)
    assert(runAuc(256) === auc1)
    val wdf = (1 to 300).map(i =>
      (s"n${i % 5}", rnd.nextInt(25), rnd.nextInt(9) + 1L, i.toLong))
      .toDF("g", "x", "w", "t")
    def runWm(b: Int) = RankStats.weightedMedian(
        wdf, $"g", $"x", $"w", $"t", buckets = b)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Int]("w_median"), r.getAs[Long]("total_w")))).toMap
    val wm1 = runWm(1)
    assert(wm1.keySet === Set("n0", "n1", "n2", "n3", "n4"))
    assert(runWm(8) === wm1)
    assert(runWm(256) === wm1)
  }

  test("dominant tie value (60% of rows share one x): bucketed ranking " +
      "== single-window form, midranks exact") {
    // the hot-tie shape the zipf scale gate plants in l_quantity: a
    // monotone bucketing must put the whole tie in ONE bucket, and the
    // midrank algebra must still be exact there
    val rnd = new scala.util.Random(23)
    val rows = (1 to 500).map { i =>
      val x = if (rnd.nextInt(10) < 6) 25 else rnd.nextInt(50) + 1
      (s"g${i % 3}", x, rnd.nextInt(40))
    }
    val df = rows.toDF("g", "x", "y")
    def runSp(b: Int) = RankStats.spearman(df, $"g", $"x", $"y",
        rankBuckets = b)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("rho2_bp")).toMap
    val sp1 = runSp(1) // whole-group single window: the reference form
    assert(runSp(256) === sp1)
    val adf = rows.map { case (g, x, y) => (g, x, y % 2 == 0) }
      .toDF("g", "x", "pos")
    def runAuc(b: Int) = RankStats.auc(adf, $"g", $"pos", $"x",
        rankBuckets = b)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("auc_bp")).toMap
    assert(runAuc(256) === runAuc(1))
    spark.catalog.clearCache()
  }

  test("null group keys survive the bucketed prefix machinery " +
      "(window parity: null keys are their own partition)") {
    // the r11 offset joins were plain equi-joins, which silently DROP
    // null join keys — Window.partitionBy keeps them as one partition
    val adf = Seq((Some("a"), 1, false), (Some("a"), 2, true),
      (None: Option[String], 1, false), (None, 2, false), (None, 3, true))
      .toDF("g", "x", "pos")
    val auc = RankStats.auc(adf, $"g", $"pos", $"x")
      .collect().map(r => Option(r.getString(0)) -> r.getAs[Long]("auc_bp"))
      .toMap
    assert(auc == Map(Some("a") -> 10000L, None -> 10000L))
    val sdf = Seq((Some("a"), 1, 1), (Some("a"), 2, 2), (Some("a"), 3, 3),
      (None: Option[String], 1, 3), (None, 2, 2), (None, 3, 1))
      .toDF("g", "x", "y")
    val sp = RankStats.spearman(sdf, $"g", $"x", $"y")
      .collect().map(r => Option(r.getString(0)) -> r.getAs[Long]("rho2_bp"))
      .toMap
    assert(sp == Map(Some("a") -> 10000L, None -> -10000L))
    val wdf = Seq((Some("a"), 5, 1L, 1L), (None: Option[String], 7, 1L, 2L),
      (None, 9, 1L, 3L), (None, 11, 1L, 4L)).toDF("g", "x", "w", "t")
    val wm = RankStats.weightedMedian(wdf, $"g", $"x", $"w", $"t")
      .collect().map(r => Option(r.getString(0)) -> r.getAs[Int]("w_median"))
      .toMap
    assert(wm == Map(Some("a") -> 5, None -> 9))
  }

  test("mann-kendall: monotone series hit +-n_pairs; ties contribute 0") {
    val up = Seq(("g", 1, 10L), ("g", 2, 20L), ("g", 3, 30L), ("g", 4, 40L))
      .toDF("g", "t", "x")
    val u = RankStats.mannKendall(up, "g", "t", "x").collect().head
    assert(u.getAs[Long]("n_pairs") == 6L && u.getAs[Long]("s_stat") == 6L)
    val down = Seq(("g", 1, 40L), ("g", 2, 30L), ("g", 3, 10L))
      .toDF("g", "t", "x")
    val d = RankStats.mannKendall(down, "g", "t", "x").collect().head
    assert(d.getAs[Long]("s_stat") == -3L)
    val flat = Seq(("g", 1, 5L), ("g", 2, 5L), ("g", 3, 5L)).toDF("g", "t", "x")
    assert(RankStats.mannKendall(flat, "g", "t", "x")
      .collect().head.getAs[Long]("s_stat") == 0L)
  }

  test("chi-square: independent grid is 0; diagonal 2x2 golden; zero cells count") {
    // perfectly independent: every cell = R*C/N exactly
    val indep = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("p", "q")
    val i = RankStats.chiSquare(indep, $"p", $"q").collect().head
    assert(i.getAs[Long]("chi2_q6") == 0L && i.getAs[Long]("df") == 1L)
    // diagonal: chi2 = n = 20 → q6 = 20_000_000; the two ZERO cells
    // contribute half of it (missing combinations still move chi2)
    val diag = (Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("b", "y")))
      .toDF("p", "q")
    val g = RankStats.chiSquare(diag, $"p", $"q").collect().head
    assert(g.getAs[Long]("chi2_q6") == 20000000L)
    assert(g.getAs[Long]("n") == 20L)
  }

  test("chi-square GoF: exact uniform is 0; all-mass-on-one golden; unseen domain values count") {
    val uniform = (0L to 4L).flatMap(d => Seq.fill(3)(d)).toDF("d")
    val u = RankStats.chiSquareGof(uniform, $"d", 0L to 4L).collect().head
    assert(u.getAs[Long]("chi2_q6") == 0L && u.getAs[Long]("k") == 5L)
    // all 10 observations on one of 5 values: chi2 = 4·N = 40 → 4·10⁷;
    // the four UNSEEN values contribute N/5 each (10⁷ of it)
    val point = Seq.fill(10)(2L).toDF("d")
    val p = RankStats.chiSquareGof(point, $"d", 0L to 4L).collect().head
    assert(p.getAs[Long]("chi2_q6") == 40000000L)
    assert(p.getAs[Long]("n") == 10L)
  }

  test("weighted median: lower median, weights dominate, boundary exact") {
    // weights pull the median to the heavy value
    val df = Seq(("g", 1L, 1L, 1L), ("g", 2L, 1L, 2L), ("g", 10L, 6L, 3L))
      .toDF("g", "x", "w", "t")
    val r = RankStats.weightedMedian(df, $"g", $"x", $"w", $"t").collect().head
    assert(r.getAs[Long]("w_median") == 10L && r.getAs[Long]("total_w") == 8L)
    // exact half boundary takes the LOWER value (2*cum == tot qualifies)
    val even = Seq(("g", 1L, 2L, 1L), ("g", 5L, 2L, 2L)).toDF("g", "x", "w", "t")
    assert(RankStats.weightedMedian(even, $"g", $"x", $"w", $"t")
      .collect().head.getAs[Long]("w_median") == 1L)
  }

  test("passAtK: hand-computed goldens; k clamps to n; all-correct and " +
      "none-correct extremes") {
    import spark.implicits._
    // task A: n=5, c=2, k=3 -> 1 - C(3,3)/C(5,3) = 1 - 1/10 -> 9000 bp
    // task B: n=2, c=1, k=3 -> k_eff=2 -> 1 - C(1,2)/C(2,2) = 1 -> 10000
    // task C: n=4, c=0 -> 0 ; task D: n=3, c=3 -> 10000
    val rows =
      Seq.fill(2)(("A", true)) ++ Seq.fill(3)(("A", false)) ++
      Seq(("B", true), ("B", false)) ++
      Seq.fill(4)(("C", false)) ++ Seq.fill(3)(("D", true))
    val out = RankStats.passAtK(rows.toDF("task", "ok"), "task", $"ok", k = 3)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("pass_bp")).toMap
    assert(out === Map("A" -> 9000L, "B" -> 10000L, "C" -> 0L, "D" -> 10000L))
  }

  test("calibrationError: perfectly calibrated buckets -> ECE 0; " +
      "hand-computed gap and Brier") {
    import spark.implicits._
    // one bucket (conf 2500, decile 2): 4 rows, 1 positive -> acc 2500
    // == mean conf -> gap 0; second bucket (conf 7500): 2 rows, 2
    // positives -> acc 10000, conf 7500 -> gap 2500
    val rows = Seq((2500L, false), (2500L, false), (2500L, false),
      (2500L, true), (7500L, true), (7500L, true))
    val out = RankStats.calibrationError(
        rows.toDF("conf", "y"), $"conf", $"y")
      .collect().head
    assert(out.getAs[Long]("n") === 6L)
    // ece = (4*0 + 2*2500) / 6 = 833
    assert(out.getAs[Long]("ece_bp") === 833L)
    assert(out.getAs[Long]("mce_bp") === 2500L)
    // brier_q8 = (3*2500^2 + 7500^2 + 2*2500^2) / 6
    val brier = (3L * 2500 * 2500 + 7500L * 7500 + 2L * 2500 * 2500) / 6
    assert(out.getAs[Long]("brier_q8") === brier)
    spark.catalog.clearCache()
  }

  test("kendallTau: hand-computed tau-b with x-ties; count-weighted cells; " +
      "constant column emits 0") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    import org.apache.spark.sql.functions.col
    // points (1,1)(2,3)(3,2)(4,4)(4,5): C=8, D=1 (the (2,3)/(3,2)
    // inversion), DE is an x-tie pair -> neither; n1=1, n2=0
    // tau-b = 7/sqrt(9*10) = 0.7378... -> 7378 bp
    val g1 = Seq((1, 1), (2, 3), (3, 2), (4, 4), (4, 5))
      .map { case (x, y) => ("g1", x.toLong, y.toLong) }
    // (1,1) twice + (2,2): the duplicated cell rides as count 2 ->
    // C = 2, ties n1 = n2 = 1, tau-b = 2/sqrt(2*2) = 1 -> 10000
    val g2 = Seq(("g2", 1L, 1L), ("g2", 1L, 1L), ("g2", 2L, 2L))
    // constant y: denominator zero -> 0 by contract
    val g3 = Seq(("g3", 1L, 7L), ("g3", 2L, 7L), ("g3", 3L, 7L))
    val out = RankStats.kendallTau((g1 ++ g2 ++ g3).toDF("g", "x", "y"),
        col("g"), col("x"), col("y"))
      .collect().map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("c_conc"), r.getAs[Long]("d_disc"),
          r.getAs[Long]("n1"), r.getAs[Long]("n2"),
          r.getAs[Long]("tau_b_bp")))).toMap
    assert(out("g1") === ((8L, 1L, 1L, 0L, 7378L)))
    assert(out("g2") === ((2L, 0L, 1L, 1L, 10000L)))
    assert(out("g3")._5 === 0L)
  }

  test("kendallTau equals the naive O(n^2) pair loop on random tied data") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(53)
    val rows = for {
      g <- Seq("p", "q", "r"); _ <- 1 to 40
    } yield (g, rnd.nextInt(12).toLong, rnd.nextInt(8).toLong)
    // brute force per group
    def naive(pts: Seq[(Long, Long)]): (Long, Long, Long, Long, Long) = {
      var c = 0L; var d = 0L
      for (i <- pts.indices; j <- (i + 1) until pts.size) {
        val ((xi, yi), (xj, yj)) = (pts(i), pts(j))
        val s = (xi - xj).sign * (yi - yj).sign
        if (s > 0) c += 1 else if (s < 0) d += 1
      }
      val n = pts.size.toLong
      def ties(f: ((Long, Long)) => Long) =
        pts.groupBy(f).values.map(v => v.size.toLong * (v.size - 1) / 2).sum
      val (n0, n1, n2) = (n * (n - 1) / 2, ties(_._1), ties(_._2))
      val tau = math.floor(10000.0 * (c - d) /
        math.sqrt((n0 - n1).toDouble * (n0 - n2).toDouble)).toLong
      (c, d, n1, n2, tau)
    }
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      g -> naive(rs.map(t => (t._2, t._3))) }
    val got = RankStats.kendallTau(rows.toDF("g", "x", "y"),
        col("g"), col("x"), col("y"))
      .collect().map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("c_conc"), r.getAs[Long]("d_disc"),
          r.getAs[Long]("n1"), r.getAs[Long]("n2"),
          r.getAs[Long]("tau_b_bp")))).toMap
    assert(got === want)
  }
}
