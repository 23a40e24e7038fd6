package graft

import graft.ops.Resample
import java.sql.Timestamp

/** Gap-fill resample goldens: grid completeness, carry-forward fill,
  * per-bucket last-observation pick, and per-key grid independence —
  * the within-bucket/within-gap mechanics the relational oracle only
  * checks in aggregate. */
class ResampleSpec extends SparkSpec {

  import spark.implicits._

  private val ts = (s: String) => Timestamp.valueOf(s)
  // epoch hour of 2024-01-01 00:00 UTC (session timezone is pinned UTC)
  private val hb = 1704067200L / 3600L

  test("gapFill completes the grid and carries the last value forward") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:05:00"), 10L, 1.5), // bucket 0, early
      (1L, ts("2024-01-01 00:50:00"), 11L, 2.5), // bucket 0, last -> wins
      (1L, ts("2024-01-01 03:10:00"), 12L, 7.25), // bucket 3 after a 2h gap
      (2L, ts("2024-01-01 01:00:00"), 20L, 4.0) // single-bucket key
    ).toDF("user_id", "ts", "event_id", "value")
    val out = Resample.gapFill(ev, bucketSeconds = 3600L)
      .orderBy("user_id", "b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4)))
    assert(out.toSeq === Seq(
      (1L, hb + 0, 2L, Some(25000L), 25000L),
      (1L, hb + 1, 0L, None, 25000L), // gap: carried forward
      (1L, hb + 2, 0L, None, 25000L),
      (1L, hb + 3, 1L, Some(72500L), 72500L),
      (2L, hb + 1, 1L, Some(40000L), 40000L)))
  }

  test("within-bucket ties on ts resolve by the tie column (event_id)") {
    val t = ts("2024-01-01 00:30:00")
    val ev = Seq(
      (1L, t, 5L, 1.0),
      (1L, t, 9L, 3.0), // same ts, larger event_id -> the bucket's last
      (1L, t, 7L, 2.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = Resample.gapFill(ev, 3600L).collect()
    assert(out.length === 1)
    assert(out.head.getLong(4) === 30000L)
  }

  test("timeWeightedAvg: step-integral weighting, zero-span null, exact integers") {
    val ev = Seq(
      // user 1: v=10 holds 100 s, v=20 holds 300 s, last value ignored
      // twa = (100000*100 + 200000*300) / 400 = 175000 (17.5 in q4)
      (1L, ts("2024-01-01 00:00:00"), 1L, 10.0),
      (1L, ts("2024-01-01 00:01:40"), 2L, 20.0),
      (1L, ts("2024-01-01 00:06:40"), 3L, 99.0),
      (2L, ts("2024-01-01 05:00:00"), 4L, 7.0) // single event: span 0
    ).toDF("user_id", "ts", "event_id", "value")
    val out = Resample.timeWeightedAvg(ev).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    assert(out(1L) === ((3L, Some(175000L))))
    assert(out(2L) === ((1L, None)))
  }

  test("timeWeightedAvg differs from plain avg exactly when holds are unequal") {
    // v=0 for 9 s then v=100 for 1 s: plain avg of observations = 50;
    // twa = (0*9 + 100e4*1)/10 = 100000 (10.0) - the held-time answer
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, 0.0),
      (1L, ts("2024-01-01 00:00:09"), 2L, 100.0),
      (1L, ts("2024-01-01 00:00:10"), 3L, 0.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val r = Resample.timeWeightedAvg(ev).head
    assert(r.getLong(4) === 100000L)
  }

  test("grids are per-key: a quiet key never inherits another key's span") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:10:00"), 1L, 1.0),
      (1L, ts("2024-01-05 00:10:00"), 2L, 2.0), // 96h span for key 1
      (2L, ts("2024-01-02 12:00:00"), 3L, 5.0) // one bucket for key 2
    ).toDF("user_id", "ts", "event_id", "value")
    val byKey = Resample.gapFill(ev, 3600L)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byKey(1L) === 97L) // inclusive [first, last] hour span
    assert(byKey(2L) === 1L) // NOT 97 - no global calendar cross join
  }

  test("anomalies: hand-computed dev^2 vs k^2*var, minObs gate, zero-variance history") {
    // history [10,20,10,20,10] (mean 14): v=20 -> dev^2(900) <= 9*var(600)=5400
    // -> calm; v=50 -> (250-70)^2=32400 > 5400 -> anomaly. q4 scaling is
    // exactly invariant (both sides scale by 1e8).
    def mk(i: Int, v: Double) =
      (1L, ts(f"2024-01-01 00:${i}%02d:00"), i.toLong, v)
    val hist = Seq(10.0, 20.0, 10.0, 20.0, 10.0).zipWithIndex
      .map { case (v, i) => mk(i + 1, v) }
    val ev = (hist :+ mk(6, 20.0) :+ mk(7, 50.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = Resample.anomalies(ev, window = 20, minObs = 5, k = 3)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(3), r.getBoolean(5)))).toMap
    // rows 1..5 have < 5 observations of history -> gated false
    (1L to 5L).foreach(i => assert(out(i) === ((i - 1, false)), s"row $i"))
    assert(out(6L) === ((5L, false)))  // within 3 sigma of its history
    // row 7's window now holds 6 obs incl. the 20: n=6, s=90, ss=1500
    // dev=(300-90)=210 -> 44100 ; 9*(6*1500-8100)=8100 -> anomaly
    assert(out(7L) === ((6L, true)))
  }

  test("anomalies: zero-variance history flags ANY deviation, equal value stays calm") {
    def mk(i: Int, v: Double) =
      (7L, ts(f"2024-01-01 01:${i}%02d:00"), 100L + i, v)
    val ev = ((1 to 5).map(i => mk(i, 10.0)) :+ mk(6, 10.0) :+ mk(7, 10.01))
      .toDF("user_id", "ts", "event_id", "value")
    val out = Resample.anomalies(ev, window = 20, minObs = 5, k = 3)
      .collect().map(r => r.getLong(1) -> r.getBoolean(5)).toMap
    assert(out(106L) === false) // v == history: dev = 0, var = 0 -> calm
    assert(out(107L) === true)  // any nonzero dev beats zero variance
  }

  private def dayEvents(counts: Seq[(String, Int, Int)]) =
    counts.flatMap { case (g, day, n) =>
      (1 to n).map(i => (g, ts(f"2024-01-${day + 1}%02d 0$i:00:00"), 0L, 0.0))
    }.toDF("event_type", "ts", "user_id", "value")

  test("autocorrelation: alternating series is negative at odd lags, " +
      "positive at even — hand-computed") {
    // counts [2,4,2,4]: n=4, S=12, Q=40, den = 16·40 − 4·144 = 64,
    // dev = [−4,4,−4,4]; lag1 Σ=−48 → −7500 bp; lag2 Σ=32 → 5000;
    // lag3 Σ=−16 → −2500 (truncating div on negatives, both engines)
    val ev = dayEvents(Seq(("a", 0, 2), ("a", 1, 4), ("a", 2, 2), ("a", 3, 4)))
    val out = Resample.autocorrelation(ev, maxLag = 3)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out(1L) === ((4L, 3L, -7500L)))
    assert(out(2L) === ((4L, 2L, 5000L)))
    assert(out(3L) === ((4L, 1L, -2500L)))
  }

  test("autocorrelation: missing days count as ZERO, not skipped") {
    // observed days 0 and 2 only → dense series [1,0,1]: n=3, S=2, Q=2,
    // den = 9·2 − 3·4 = 6, dev = [1,−2,1]; lag1 Σ=−4 → −6666; lag2 → 1666
    val ev = dayEvents(Seq(("a", 0, 1), ("a", 2, 1)))
    val out = Resample.autocorrelation(ev, maxLag = 2)
      .collect().map(r => r.getLong(1) -> r.getLong(4)).toMap
    assert(out === Map(1L -> -6666L, 2L -> 1666L))
  }

  test("changepoint: level shift located exactly, shift magnitude exact") {
    // counts [10,10,10,2,2]: n=5, S=34, dev=5c−34 = [16,16,16,−24,−24],
    // K = [16,32,48,24]; peak at t=3 → cp = 3rd day, shift =
    // K/(t(n−t)) = 48/6 = 8 = meanL−meanR = 10−2 exactly.
    val ev = dayEvents(Seq(("a", 0, 10), ("a", 1, 10), ("a", 2, 10),
      ("a", 3, 2), ("a", 4, 2)))
    val out = Resample.changepoint(ev).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val d0 = out("a")._2 // cp epoch day
    assert(out("a")._1 === 5L)
    assert(out("a")._3 === 48L)
    assert(out("a")._4 === 80000L)
    // the cp day is the THIRD day of the span
    val firstDay = java.time.LocalDate.parse("2024-01-01").toEpochDay
    assert(d0 === firstDay + 2)
  }

  test("changepoint: upward shift is negative shift_q4; 1-day series absent") {
    // [2,10]: dev = [−8, 8], K1 = −8 → shift = −8/(1·1) = −8
    val ev = dayEvents(Seq(("a", 0, 2), ("a", 1, 10), ("b", 0, 3)))
    val rows = Resample.changepoint(ev).collect()
    val a = rows.filter(_.getString(0) == "a").head
    assert(a.getLong(3) === 8L && a.getLong(4) === -80000L)
    assert(!rows.exists(_.getString(0) == "b"))
  }

  test("seasonalBacktest: hand-computed MAE/bias/sMAPE on a periodic " +
      "series; gap days forecast as zero counts") {
    // type x: 14 days, count(d) = (d mod 3) + 1; season 7, horizon 3 →
    // eval d ∈ {11,12,13}: e = c(d)−c(d−7) = (3−2, 1−3, 2−1) = (1,−2,1)
    // mae = 40000 div 3 = 13333; bias = 0; smape per day =
    // (10⁴·1/5, 10⁴·2/4, 10⁴·1/3) = (2000, 5000, 3333) → 10333 div 3
    val x = (0 to 13).map(d => ("x", d, (d % 3) + 1))
    // type y: observed only on day 0 (2 events) and day 9 (1) — the
    // dense grid must zero-fill days 1..8; eval d ∈ {7,8,9}:
    // e = (0−2, 0−0, 1−0); mae = 30000 div 3; bias = −10⁴ div 3;
    // smape = (10000, 0, 10000) → 20000 div 3
    val y = Seq(("y", 0, 2), ("y", 9, 1))
    val out = Resample.seasonalBacktest(dayEvents(x ++ y),
        season = 7, horizon = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(out.toSeq === Seq(
      ("x", 3L, 13333L, 0L, 3444L),
      ("y", 3L, 10000L, -3333L, 6666L)))
  }

  test("seasonalBacktest: series shorter than the season emits no row") {
    val ev = dayEvents(Seq(("a", 0, 2), ("a", 3, 1)))
    assert(Resample.seasonalBacktest(ev, season = 7, horizon = 3)
      .collect().isEmpty)
  }

  test("theilSen: outlier day does not move the median slope; gap days " +
      "enter the series as zeros") {
    // counts [1,2,3,4,9]: 10 pairwise slopes, six of them 10⁶ — the
    // lower median (rank 5 of 10) is 10⁶ no matter how wild day 4 is
    val a = Seq(("a", 0, 1), ("a", 1, 2), ("a", 2, 3), ("a", 3, 4), ("a", 4, 9))
    // b: days [1,0,1] after zero-fill -> slopes (−10⁶, 0, 10⁶), median 0
    val b = Seq(("b", 0, 1), ("b", 2, 1))
    val ev = dayEvents(a ++ b)
    val rows = Resample.theilSen(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows("a") === ((10L, 1000000L)))
    assert(rows("b") === ((3L, 0L)))
  }

  test("autocorrelation: constant series has zero variance -> null r_bp; " +
      "series shorter than the lag has no row") {
    val ev = dayEvents(Seq(("a", 0, 3), ("a", 1, 3), ("b", 0, 1)))
    val rows = Resample.autocorrelation(ev, maxLag = 3).collect()
    val a = rows.filter(_.getString(0) == "a")
    assert(a.map(_.getLong(1)).toSet === Set(1L)) // only lag 1 has pairs
    assert(a.forall(_.isNullAt(4)))               // den = 0 -> null
    assert(!rows.exists(_.getString(0) == "b"))   // 1-day series: no pairs
  }

  test("interpolate: straight line between neighbors, observed buckets keep their value") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:30:00"), 10L, 1.0),  // bucket b0, v=10000
      (1L, ts("2024-01-04 00:30:00"), 11L, 4.0),  // b0+3, v=40000 → gaps at +1, +2
      (1L, ts("2024-01-04 00:40:00"), 12L, 7.0),  // same bucket, later → wins (70000)
      (2L, ts("2024-01-01 00:00:00"), 20L, 5.0)   // single-bucket key: no gaps
    ).toDF("user_id", "ts", "event_id", "value")
    val out = Resample.interpolate(ev, bucketSeconds = 86400L)
      .orderBy("user_id", "b").collect()
      .map(r => (r.getLong(0), r.getBoolean(2), r.getLong(3)))
    // line from 10000 to 70000 over 3 days: +20000/day
    assert(out.toSeq === Seq(
      (1L, true, 10000L), (1L, false, 30000L), (1L, false, 50000L),
      (1L, true, 70000L), (2L, true, 50000L)))
  }

  test("interpolate: uneven rational slope floors, per-key grids stay independent") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, 0.0001), // 1 in q4
      (1L, ts("2024-01-08 00:00:00"), 2L, 0.0011), // 11 in q4, 7 days later
      (3L, ts("2024-02-01 00:00:00"), 3L, 2.0),
      (3L, ts("2024-02-03 00:00:00"), 4L, 0.0)     // down-slope: 20000 → 0
    ).toDF("user_id", "ts", "event_id", "value")
    val out = Resample.interpolate(ev, bucketSeconds = 86400L)
      .orderBy("user_id", "b").collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    // key 1: (1·(7−b) + 11·b) div 7 for b = 0..7
    val k1 = out.filter(_._1 == 1L).map(_._2)
    assert(k1.toSeq === Seq(1L, 2L, 3L, 5L, 6L, 8L, 9L, 11L))
    // key 3: midpoint of a DOWNWARD line still non-negative (20000, 10000, 0)
    assert(out.filter(_._1 == 3L).map(_._2).toSeq === Seq(20000L, 10000L, 0L))
  }

  test("seasonalDecompose: a pure period-3 pattern decomposes to flat trend, " +
      "exact seasonal, zero residuals; edges are null") {
    // counts [5,1,3] repeating over 9 days: every centered 3-window sums
    // 9 → trend_q4 = 30000 flat; detrended = {20000, -20000, 0} by
    // phase; seasonal sums to 0 so centering is a no-op; resid = 0
    val ev = dayEvents((0 until 9).map(k => ("a", k, Seq(5, 1, 3)(k % 3))))
    val rows = graft.ops.Resample.seasonalDecompose(ev, period = 3)
      .orderBy("d").collect()
      .map(r => (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getLong(4), Option(r.get(5)).map(_.asInstanceOf[Long])))
    assert(rows.length === 9)
    rows.zipWithIndex.foreach { case ((c, trend, seasonal, resid), k) =>
      assert(c === Seq(5L, 1L, 3L)(k % 3))
      // counts 5/1/3 detrend to +20000/-20000/0 — the seasonal class of
      // day k is fixed by k mod period
      assert(seasonal === Seq(20000L, -20000L, 0L)(k % 3), s"day $k seasonal")
      if (k == 0 || k == 8) { // no full centered window
        assert(trend.isEmpty && resid.isEmpty, s"day $k edge")
      } else {
        assert(trend === Some(30000L), s"day $k trend")
        assert(resid === Some(0L), s"day $k resid")
      }
    }
  }

  test("burst viterbi: sustained burst flips state, lone spike is absorbed, " +
      "hand-computed DP") {
    import graft.functions.BurstKernel
    // mu0=2 (mu1=5), gamma=3: a single 9 costs less to absorb (7) than
    // to visit state 1 and come back (4 + 2 switches) -> all baseline
    assert(BurstKernel.viterbi(Array(2L, 2L, 9L, 2L, 2L), 2L, 3L).toSeq ===
      Seq(0, 0, 0, 0, 0))
    // three consecutive 9s amortize the two switches -> burst segment
    assert(BurstKernel.viterbi(Array(2L, 2L, 9L, 9L, 9L, 2L), 2L, 3L).toSeq ===
      Seq(0, 0, 1, 1, 1, 0))
    // end-to-end through the daily-series op: same series, mu0 = lower
    // median = 2, gamma = mu0 + 1 = 3
    val ev = dayEvents(Seq(("a", 0, 2), ("a", 1, 2), ("a", 2, 9),
      ("a", 3, 9), ("a", 4, 9), ("a", 5, 2)))
    val out = graft.ops.Resample.burstSegments(ev)
      .orderBy("d").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getInt(4)))
    assert(out.map(_._2).forall(_ == 2L))
    assert(out.map(_._3).toSeq === Seq(0, 0, 1, 1, 1, 0))
    assert(out.map(_._1).toSeq === Seq(2L, 2L, 9L, 9L, 9L, 2L))
  }

  test("ewma: hand-computed trailing weights, gap days count as zero, " +
      "early days renormalize over the available lags") {
    // counts [2, 0 (gap day), 4], span 2 → weights (lag0, lag1) = (2, 1):
    //   d0: num = 2·2 = 4,       den = 2 → 40000 div 2 = 20000
    //   d1: num = 0·2 + 2·1 = 2, den = 3 →  20000 div 3 = 6666
    //   d2: num = 4·2 + 0·1 = 8, den = 3 →  80000 div 3 = 26666
    val ev = dayEvents(Seq(("a", 0, 2), ("a", 2, 4)))
    val out = Resample.ewma(ev, span = 2)
      .orderBy("d").collect()
      .map(r => (r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((2L, 20000L), (0L, 6666L), (4L, 26666L)))
    // span 1 degenerates to the raw counts in q4
    val raw = Resample.ewma(ev, span = 1)
      .orderBy("d").collect().map(_.getLong(3))
    assert(raw.toSeq === Seq(20000L, 0L, 40000L))
    // independent groups keep independent spans
    val two = Resample.ewma(
      dayEvents(Seq(("a", 0, 2), ("a", 1, 2), ("b", 5, 3))), span = 3)
    assert(two.where($"event_type" === "b").count() === 1)
  }
}
