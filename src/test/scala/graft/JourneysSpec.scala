package graft

import org.apache.spark.sql.functions._
import graft.ops.Journeys

/** Funnel/retention semantics the oracle gate can't isolate: strict
  * ordering (a click BEFORE the first view doesn't count), simultaneous
  * events, partial funnels, and cohort week-0 completeness. */
class JourneysSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("funnel: chained-earliest with strict order; pre-view clicks don't count") {
    val events = Seq(
      // user 1: full funnel, but the earliest click precedes the view
      (1L, ts("2026-01-01 09:00:00"), "click"),    // before first view: ignored
      (1L, ts("2026-01-01 10:00:00"), "view"),
      (1L, ts("2026-01-01 11:00:00"), "click"),    // this one counts
      (1L, ts("2026-01-01 12:00:00"), "purchase"),
      // user 2: view only
      (2L, ts("2026-01-01 10:00:00"), "view"),
      // user 3: purchase with no view/click: stage 0
      (3L, ts("2026-01-01 10:00:00"), "purchase"),
      // user 4: click simultaneous with first view doesn't count (strict >)
      (4L, ts("2026-01-01 10:00:00"), "view"),
      (4L, ts("2026-01-01 10:00:00"), "click"),
      (4L, ts("2026-01-01 10:30:00"), "click"))
      .toDF("user_id", "ts", "event_type")
    val out = Journeys.funnel(events, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getTimestamp(2), r.getTimestamp(3), r.getTimestamp(4)))).toMap
    assert(out(1L) === ((3, ts("2026-01-01 10:00:00"),
      ts("2026-01-01 11:00:00"), ts("2026-01-01 12:00:00"))))
    assert(out(2L) === ((1, ts("2026-01-01 10:00:00"), null, null)))
    assert(out(3L) === ((0, null, null, null)))
    assert(out(4L) === ((2, ts("2026-01-01 10:00:00"),
      ts("2026-01-01 10:30:00"), null)))
  }

  test("retention: week 0 holds the whole cohort; offsets are 7-day buckets from Monday") {
    val events = Seq(
      (1L, ts("2026-01-07 10:00:00")), // Wed of week starting Mon 2026-01-05
      (1L, ts("2026-01-13 10:00:00")), // next week → offset 1
      (1L, ts("2026-01-13 11:00:00")), // same week, same user → one row
      (2L, ts("2026-01-09 10:00:00")), // same cohort week, week 0 only
      (3L, ts("2026-01-14 10:00:00"))) // cohort week of Mon 2026-01-12
      .toDF("user_id", "ts")
    val out = Journeys.retention(events).collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2))).toSet
    assert(out === Set(
      ("2026-01-05 00:00:00.0", 0L, 2L),
      ("2026-01-05 00:00:00.0", 1L, 1L),
      ("2026-01-12 00:00:00.0", 0L, 1L)))
  }

  test("transitions: per-user adjacency only, exact counts and basis points") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    // user 1: v -> c -> v -> c ; user 2: p (no pair; also its v must NOT
    // chain onto user 1's last event)
    val events = Seq(
      (1L, ts("2024-01-01 00:01:00"), 1L, "view"),
      (1L, ts("2024-01-01 00:02:00"), 2L, "click"),
      (1L, ts("2024-01-01 00:03:00"), 3L, "view"),
      (1L, ts("2024-01-01 00:04:00"), 4L, "click"),
      (2L, ts("2024-01-01 00:05:00"), 5L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Journeys.transitions(events).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out === Map(
      ("view", "click") -> ((2L, 10000L)),
      ("click", "view") -> ((1L, 10000L))))
  }

  test("sessions: gap splits, ordinals in time order, boundary gap stays in-session") {
    val ts = (s: Long) => new java.sql.Timestamp(1700000000000L + s * 1000L)
    val ev = Seq(
      (1L, ts(0), 1L, "view"), // session 1
      (1L, ts(1800), 2L, "click"), // exactly the gap → SAME session
      (1L, ts(1800 + 1801), 3L, "view"), // 1801 s gap → session 2
      (1L, ts(1800 + 1801 + 10), 4L, "click"),
      (2L, ts(50), 5L, "view")) // separate key
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Journeys.sessions(ev, gapSeconds = 1800L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(5)))).toMap
    val base = 1700000000L
    assert(out((1L, 1L)) === ((2L, 1800L))) // 2 events, 1800 s long
    assert(out((1L, 2L)) === ((2L, 10L)))
    assert(out((2L, 1L)) === ((1L, 0L)))
    assert(out.size === 3)
    assert(Journeys.sessions(ev, 1800L).where(col("start_es") === base).count() === 1)
  }

  test("rollingActives: window membership, within-day dedupe, span clipping") {
    // epoch day of 2026-01-01 is fixed; users: u1 active day0+day2,
    // u2 active day0 (twice - must dedupe), u3 day3 (the last day)
    val events = Seq(
      (1L, ts("2026-01-01 09:00:00")), (1L, ts("2026-01-03 09:00:00")),
      (2L, ts("2026-01-01 08:00:00")), (2L, ts("2026-01-01 22:00:00")),
      (3L, ts("2026-01-04 12:00:00"))
    ).toDF("user_id", "ts")
    val d0 = java.time.LocalDate.of(2026, 1, 1).toEpochDay
    val out = Journeys.rollingActives(events, windowDays = 2)
      .collect().map(r => (r.getLong(0) - d0) -> r.getLong(1)).toMap
    // day0: {u1,u2}; day1: window {day0,day1} -> {u1,u2}; day2: {u1};
    // day3: window {day2,day3} -> {u1,u3}; day4 clipped (past last day)
    assert(out === Map(0L -> 2L, 1L -> 2L, 2L -> 1L, 3L -> 2L))
  }

  test("transitions: same-timestamp order resolves by the tie column") {
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val events = Seq(
      (1L, t, 2L, "b"), (1L, t, 1L, "a"), (1L, t, 3L, "c"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Journeys.transitions(events).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out === Set(("a", "b"), ("b", "c"))) // event_id order: a b c
  }

  test("lastTouchAttribution: latest touch wins, same-instant touch counts, lookback expiry and no-touch go direct") {
    val events = Seq(
      // user 1: view then click then purchase — click (latest) wins
      (10L, 1L, ts("2026-01-01 10:00:00"), "view", 0.0),
      (11L, 1L, ts("2026-01-01 11:00:00"), "click", 0.0),
      (12L, 1L, ts("2026-01-01 12:00:00"), "purchase", 5.00),
      // user 1 second purchase: same click still in window
      (13L, 1L, ts("2026-01-02 12:00:00"), "purchase", 2.50),
      // user 2: touch at the purchase's exact instant counts
      (20L, 2L, ts("2026-01-01 10:00:00"), "view", 0.0),
      (21L, 2L, ts("2026-01-01 10:00:00"), "purchase", 1.00),
      // user 3: touch outside the 1-hour lookback → direct
      (30L, 3L, ts("2026-01-01 08:00:00"), "click", 0.0),
      (31L, 3L, ts("2026-01-01 10:00:00"), "purchase", 4.00),
      // user 4: no touch at all → direct
      (40L, 4L, ts("2026-01-01 10:00:00"), "purchase", 8.00))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Journeys.lastTouchAttribution(events, Seq("click", "view"),
        "purchase", lookbackSeconds = 3600)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(12L) === (("click", 500L)))
    assert(out(13L) === (("direct", 250L))) // click was 25h earlier
    assert(out(21L) === (("view", 100L)))
    assert(out(30L + 1L) === (("direct", 400L)))
    assert(out(40L) === (("direct", 800L)))
    assert(out.size === 5) // one row per conversion, touches never leak
  }

  test("decayedPopularity: exact right-shift halving per whole half-life, shift capped") {
    val events = Seq(
      // ref = max ts = 2026-01-29 00:00:00
      (1L, 1L, ts("2026-01-29 00:00:00"), "view", 4.00),  // age 0 → 400
      (2L, 1L, ts("2026-01-22 00:00:00"), "view", 4.00),  // 1 half-life → 200
      (3L, 1L, ts("2026-01-15 00:00:00"), "view", 4.00),  // 2 → 100
      (4L, 1L, ts("2026-01-21 23:59:59"), "click", 8.00), // 1.000002 → >>1 = 400
      (5L, 1L, ts("2026-01-28 00:00:01"), "click", 8.00)) // 0.99… → >>0 = 800
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = graft.ops.Journeys
      .decayedPopularity(events, halfLifeSeconds = 7L * 86400)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("view") === ((3L, 700L)))
    assert(out("click") === ((2L, 1200L)))
    // explicit reference instant: everything ages one more half-life
    val ref2 = java.sql.Timestamp.valueOf("2026-02-05 00:00:00").getTime * 1000L
    val shifted = graft.ops.Journeys
      .decayedPopularity(events, 7L * 86400, refUs = Some(ref2))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(shifted("view") === 350L)
  }

  test("frequentPaths: time-ordered trigrams, short sequences excluded, deterministic tiebreak") {
    val events = Seq(
      // user 1: view > click > purchase > view  (two trigrams)
      (1L, 1L, ts("2026-01-01 10:00:00"), "view"),
      (2L, 1L, ts("2026-01-01 11:00:00"), "click"),
      (3L, 1L, ts("2026-01-01 12:00:00"), "purchase"),
      (4L, 1L, ts("2026-01-01 13:00:00"), "view"),
      // user 2: same first journey
      (5L, 2L, ts("2026-01-02 10:00:00"), "view"),
      (6L, 2L, ts("2026-01-02 11:00:00"), "click"),
      (7L, 2L, ts("2026-01-02 12:00:00"), "purchase"),
      // user 3: too short — contributes nothing
      (8L, 3L, ts("2026-01-03 10:00:00"), "view"),
      (9L, 3L, ts("2026-01-03 11:00:00"), "click"),
      // user 4: simultaneous events order by event_id
      (10L, 4L, ts("2026-01-04 10:00:00"), "signup"),
      (11L, 4L, ts("2026-01-04 10:00:00"), "view"),
      (12L, 4L, ts("2026-01-04 10:00:00"), "click"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = graft.ops.Journeys.frequentPaths(events, pathLen = 3, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(out.head === ("view>click>purchase", 2L))
    assert(out.toMap === Map(
      "view>click>purchase" -> 2L,
      "click>purchase>view" -> 1L,
      "signup>view>click" -> 1L))
    // ties rank alphabetically after the count
    assert(out.map(_._1).drop(1) ===
      Seq("click>purchase>view", "signup>view>click"))
  }

  test("nextEventAccuracy: temporal holdout, boundary pairs dropped, " +
      "unseen from-types score zero") {
    val t = (s: Long) => new java.sql.Timestamp(1700000000000L + s * 1000L)
    // span [0s, 100s] -> split at 50s. Train (user a): view->click x2,
    // click->view x1; the (30s,60s) pair crosses the split and drops.
    val ev = Seq(
      ("a", 0L, 1L, "view"), ("a", 10L, 2L, "click"),
      ("a", 20L, 3L, "view"), ("a", 30L, 4L, "click"),
      ("a", 60L, 5L, "view"), ("a", 70L, 6L, "click"),
      ("a", 80L, 7L, "purchase"),
      ("b", 55L, 8L, "error"), ("b", 65L, 9L, "signup"),
      ("b", 100L, 10L, "view"))
      .map { case (u, s, id, ty) => (u, t(s), id, ty) }
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Journeys.nextEventAccuracy(ev)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out === Map(
      "view" -> ((1L, 1L, 10000L)),   // model(view)=click, eval hit
      "click" -> ((1L, 0L, 0L)),      // model(click)=view, eval was purchase
      "error" -> ((1L, 0L, 0L)),      // unseen in train: no prediction
      "signup" -> ((1L, 0L, 0L))))    // unseen in train
  }

  test("latenessAudit: lateness measured against the running max, banded") {
    val t = (s: Long) => new java.sql.Timestamp(1700000000000L + s * 1000L)
    // arrival order 1..5; event-times: 100s, 40s (60s late -> <=1m),
    // 101s (new max, on-time), 41s (60s+1? -> 101-41=60s no: 60s is <=1m)
    val ev = Seq(
      (1L, t(100), "a"), (2L, t(40), "a"), (3L, t(101), "a"),
      (4L, t(3700), "a"), (5L, t(95), "a")) // 5th: 3700-95 = 3605s -> >1h
      .toDF("event_id", "ts", "event_type")
    val out = Journeys.latenessAudit(ev)
      .collect().map(r => r.getLong(1) -> (r.getString(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out === Map(
      0L -> (("on-time", 3L, 6000L)),  // arrivals 1, 3, 4 set new maxima
      1L -> (("<=1m", 1L, 2000L)),     // arrival 2: 60s late
      4L -> ((">1h", 1L, 2000L))))     // arrival 5: 3605s late
  }

  private def rfmEvents(rows: Seq[(Long, Int, String, Double)]) =
    rows.map { case (u, day, t, v) =>
      (u, ts(f"2024-01-${day + 1}%02d 01:00:00"), t, v)
    }.toDF("user_id", "ts", "event_type", "value")

  test("rfm: four strictly ordered users land in bins 1..4 on every axis") {
    // u1 oldest/least/no purchase ... u4 freshest/most/biggest spender
    val ev = rfmEvents(Seq(
      (1L, 0, "view", 1.0),
      (2L, 0, "view", 0.0), (2L, 1, "purchase", 5.0),
      (3L, 0, "view", 0.0), (3L, 1, "view", 0.0), (3L, 2, "purchase", 10.0),
      (4L, 0, "view", 0.0), (4L, 1, "view", 0.0), (4L, 2, "view", 0.0),
      (4L, 3, "purchase", 20.0)))
    val out = Journeys.rfm(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(7)))).toMap
    assert(out(1L) === ((3L, 1L, 0L, "R4F1M1")))
    assert(out(2L) === ((2L, 2L, 50000L, "R3F2M2")))
    assert(out(3L) === ((1L, 3L, 100000L, "R2F3M3")))
    assert(out(4L) === ((0L, 4L, 200000L, "R1F4M4")))
  }

  test("rfm: identical metrics share a bin (ties share the group's " +
      "first rank)") {
    val ev = rfmEvents((1L to 4L).flatMap(u => Seq(
      (u, 0, "view", 0.0), (u, 1, "purchase", 3.0))))
    val segs = Journeys.rfm(ev).collect().map(_.getString(7)).toSet
    assert(segs === Set("R1F1M1"))
  }

  test("cohortLtv: cumulative purchase value with dense offsets; " +
      "non-purchase events join the cohort but add no value") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "purchase", 5.0),
      (1L, ts("2024-01-15 10:00:00"), "purchase", 2.0), // offset 2
      (2L, ts("2024-01-03 10:00:00"), "view", 9.0)      // same cohort week
    ).toDF("user_id", "ts", "event_type", "value")
    val out = Journeys.cohortLtv(ev).orderBy("week_offset").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((0L, 1L, 50000L), (1L, 0L, 50000L),
      (2L, 1L, 70000L)))
  }

  test("stationaryDistribution: hand-computed integer power iteration " +
      "on a 2-state chain") {
    // one user, sequence a a a a b a → counts: a→a 3, a→b 1, b→a 1
    // P(a→a)=7500, P(a→b)=2500, P(b→a)=10000; π0=(5e7, 5e7)
    // π1=(87.5e6, 12.5e6); π2=(78125000, 21875000);
    // π3=(80468750, 19531250)
    val seqTypes = Seq("a", "a", "a", "a", "b", "a")
    val ev = seqTypes.zipWithIndex.map { case (t, i) =>
      (1L, ts(f"2024-01-01 0$i:00:00"), t, i.toLong)
    }.toDF("user_id", "ts", "event_type", "event_id")
    val out = Journeys.stationaryDistribution(ev, iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a" -> 80468750L, "b" -> 19531250L))
  }

  test("stickiness and newVsReturning: hand-computed two-day roster") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 11:00:00")),
      (1L, ts("2024-01-02 10:00:00")),
      (2L, ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "ts")
    val st = Journeys.stickiness(ev, longDays = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val d0 = st.keys.min
    assert(st(d0) === ((2L, 2L, 10000L)))      // both users active
    assert(st(d0 + 1) === ((1L, 2L, 5000L)))   // u1 of trailing {u1,u2}
    val nr = Journeys.newVsReturning(ev)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(nr(d0) === ((2L, 0L)) && nr(d0 + 1) === ((0L, 1L)))
  }

  test("activeTime: overlapping windows merge, gaps split bursts") {
    val base = ts("2024-01-01 00:00:00")
    def at(sec: Int) = new java.sql.Timestamp(base.getTime + sec * 1000L)
    val ev = Seq(
      (1L, at(0)), (1L, at(100)), (1L, at(700)), // [0,400] + [700,1000]
      (2L, at(50))                               // single 300s burst
    ).toDF("user_id", "ts")
    val out = Journeys.activeTime(ev, windowSeconds = 300L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out(1L) === ((2L, 700L)))
    assert(out(2L) === ((1L, 300L)))
  }

  test("streaks: islands across gaps, multiple events per day collapse") {
    import spark.implicits._
    val ev = Seq(
      // user 1: days 1,2,3 then 5,6 → longest 3, two streaks, 5 active days
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 23:00:00")),
      (1L, ts("2024-01-02 01:00:00")), (1L, ts("2024-01-03 01:00:00")),
      (1L, ts("2024-01-05 01:00:00")), (1L, ts("2024-01-06 01:00:00")),
      // user 2: one day
      (2L, ts("2024-02-01 00:00:00"))
    ).toDF("user_id", "ts")
    val out = graft.ops.Journeys.streaks(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out === Map(1L -> ((5L, 3L, 2L)), 2L -> ((1L, 1L, 1L))))
  }

  test("shapleyAttribution: hand-computed coalition values and k!-scaled numerators") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 00:01:00"), 2L, "purchase"),
      (2L, ts("2024-01-01 00:00:00"), 3L, "view"),
      (3L, ts("2024-01-01 00:00:00"), 4L, "click"),
      (3L, ts("2024-01-01 00:01:00"), 5L, "purchase"),
      (4L, ts("2024-01-01 00:00:00"), 6L, "purchase"), // empty coalition, converts
      (5L, ts("2024-01-01 00:00:00"), 7L, "click"),
      (5L, ts("2024-01-01 00:01:00"), 8L, "view")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = graft.ops.Journeys.shapleyAttribution(ev, convType = "purchase")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // k=2 (click, view); v(∅)=10000, v(click)=10000, v(view)=6666, v(both)=6000
    // phi_click = (10000−10000) + (6000−6666) = −666
    // phi_view  = (6666−10000) + (6000−10000) = −7334
    assert(out === Map(
      "click" -> ((-666L, 6000L, 10000L)),
      "view" -> ((-7334L, 6000L, 10000L))))
  }

  test("removalEffect: hand-computed absorption, chain truncation, share normalization") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 00:01:00"), 2L, "purchase"),
      (1L, ts("2024-01-01 00:02:00"), 3L, "click"), // post-conversion: truncated away
      (2L, ts("2024-01-01 00:00:00"), 4L, "view"),
      (2L, ts("2024-01-01 00:01:00"), 5L, "click"),
      (2L, ts("2024-01-01 00:02:00"), 6L, "purchase"),
      (3L, ts("2024-01-01 00:00:00"), 7L, "view") // never converts → END
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = graft.ops.Journeys.removalEffect(ev, convType = "purchase", iters = 6)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // matrix: START→view 10000; view→{CONV,click,END} 3333 each; click→CONV 10000
    // full: CONV mass = 33330000 (direct) + 33330000 (via click) = 66660000
    // remove view: START's only edge redirects to END → 0
    // remove click: only the direct 33330000 arrives
    assert(out("view") === ((66660000L, 0L, 66660000L, 6666L)))
    assert(out("click") === ((66660000L, 33330000L, 33330000L, 3333L)))
    assert(out.keySet === Set("view", "click"))
  }
}
