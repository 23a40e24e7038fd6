package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.{ColInterpolator, ScopedPersist}

/** Time-series regularization: resample an irregular event stream onto a
  * fixed per-key time grid with forward-fill — the standard feature-store
  * pre-pass (metrics dashboards, per-user activity matrices, model
  * features at fixed cadence) that the reference's ad-hoc pandas
  * resampling would cover on one machine.
  *
  * Scale shape, deliberately:
  *  - observations collapse to ONE row per (key, bucket) in a map-side
  *    combined aggregate BEFORE any grid work — raw event volume never
  *    meets the grid;
  *  - the grid is generated per key from its own [min, max] bucket span
  *    (a `sequence` explode off a key-cardinality aggregate — never a
  *    global calendar cross join, which at 100 TB would manufacture
  *    rows for the quiet 99 % of keys × minutes);
  *  - every exchange in the plan hashes on the SAME key family
  *    (`user_id`), so the grid join and the carry-forward window reuse
  *    one clustering; the fill itself is a bounded `last(_, ignoreNulls)`
  *    running window, narrow within each key's sorted slice.
  *
  * Buckets are integer epoch quotients (`epoch_us // (bucketSeconds·1e6)`)
  * and fill values ride as q4 fixed-point longs, so every emitted number
  * is exact integer arithmetic an independent engine reproduces
  * bit-for-bit (the cross-engine determinism contract used across the
  * ext layer).
  */
object Resample {

  /** Per-`keyCol` regular grid of `bucketSeconds`-wide buckets spanning
    * each key's [first, last] observed bucket, carrying
    *  - `n_events`   — observations in the bucket (0 on gap rows),
    *  - `last_q4`    — the bucket's LAST observation by (tsCol, tieCol)
    *                   as floor(value·10⁴), null on gap rows,
    *  - `filled_q4`  — `last_q4` forward-filled from the most recent
    *                   observed bucket (never null: each key's grid
    *                   starts at an observed bucket).
    *
    * The per-bucket "last observation wins" pick is a `max(struct)`
    * aggregate — (ts, tie, value) tuples are totally ordered, so the
    * reduction is associative/commutative and map-side combinable (no
    * window over raw events). */
  def gapFill(events: DataFrame, bucketSeconds: Long,
      keyCol: String = "user_id", tsCol: String = "ts",
      valueCol: String = "value", tieCol: String = "event_id"): DataFrame = {
    RangeJoin.requireTs(events, tsCol, "gapFill")
    require(bucketSeconds >= 1, s"bucketSeconds must be >= 1, got $bucketSeconds")
    val obs = events
      .select(col(keyCol).as("_k"),
        expr(s"unix_micros(cast($tsCol AS TIMESTAMP)) div ${bucketSeconds * 1000000L}").as("b"),
        col(tsCol).as("_ts"), col(tieCol).as("_tie"),
        floor(col(valueCol) * lit(10000.0)).cast("long").as("_v_q4"))
      .groupBy($"_k", $"b")
      .agg(count(lit(1)).as("n_events"),
        max(struct($"_ts", $"_tie", $"_v_q4")).as("_last"))
      .select($"_k", $"b", $"n_events", $"_last._v_q4".as("last_q4"))
    val grid = obs
      .groupBy($"_k")
      .agg(min($"b").as("_mn"), max($"b").as("_mx"))
      .select($"_k", explode(sequence($"_mn", $"_mx")).as("b"))
    val w = Window.partitionBy($"_k").orderBy($"b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(obs, Seq("_k", "b"), "left")
      .select($"_k".as(keyCol), $"b",
        coalesce($"n_events", lit(0L)).as("n_events"),
        $"last_q4",
        last($"last_q4", ignoreNulls = true).over(w).as("filled_q4"))
  }

  /** Linear-interpolation resample — [[gapFill]]'s other fill policy:
    * a missing bucket takes the straight line between its neighboring
    * observations instead of carrying the last one forward,
    *
    *   v(b) = (v_prev·(b_next − b) + v_next·(b − b_prev))
    *            div (b_next − b_prev)
    *
    * in exact integer q4 (the weighted-average form keeps the numerator
    * NON-NEGATIVE for non-negative values, which matters because floor
    * and truncate diverge on negatives across engines; `value` must be
    * ≥ 0). Observed buckets keep their own last observation (same
    * (ts, tie) pick as gapFill); the grid spans each key's own
    * [first, last] observed bucket, so both neighbors always exist.
    *
    * Scale shape: one (key, bucket) aggregate collapses raw events,
    * then partitioned cumulative/reverse-cumulative windows carry the
    * neighbor values — everything after the first aggregate runs at
    * grid size, and every window partitions by key (no global sort,
    * no single task). */
  def interpolate(events: DataFrame, bucketSeconds: Long,
      keyCol: String = "user_id", tsCol: String = "ts",
      valueCol: String = "value", tieCol: String = "event_id"): DataFrame = {
    RangeJoin.requireTs(events, tsCol, "interpolate")
    require(bucketSeconds >= 1, s"bucketSeconds must be >= 1, got $bucketSeconds")
    val obs = events
      .select(col(keyCol).as("_k"),
        expr(s"unix_micros(cast($tsCol AS TIMESTAMP)) div ${bucketSeconds * 1000000L}").as("b"),
        col(tsCol).as("_ts"), col(tieCol).as("_tie"),
        floor(col(valueCol) * lit(10000.0)).cast("long").as("_v_q4"))
      .groupBy($"_k", $"b")
      .agg(max(struct($"_ts", $"_tie", $"_v_q4")).as("_last"))
      .select($"_k", $"b", $"_last._v_q4".as("obs_q4"))
      .persistScoped // read twice: span aggregate + grid join
    val grid = obs
      .groupBy($"_k")
      .agg(min($"b").as("_mn"), max($"b").as("_mx"))
      .select($"_k", explode(sequence($"_mn", $"_mx")).as("b"))
    val wp = Window.partitionBy($"_k").orderBy($"b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.partitionBy($"_k").orderBy($"b")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    grid
      .join(obs, Seq("_k", "b"), "left")
      .select($"_k", $"b", $"obs_q4",
        last($"obs_q4", ignoreNulls = true).over(wp).as("_pv"),
        last(when($"obs_q4".isNotNull, $"b"), ignoreNulls = true).over(wp).as("_pb"),
        first($"obs_q4", ignoreNulls = true).over(wn).as("_nv"),
        first(when($"obs_q4".isNotNull, $"b"), ignoreNulls = true).over(wn).as("_nb"))
      .select($"_k".as(keyCol), $"b",
        $"obs_q4".isNotNull.as("is_observed"),
        when($"obs_q4".isNotNull, $"obs_q4")
          .otherwise(expr("(_pv * (_nb - b) + _nv * (b - _pb)) div (_nb - _pb)"))
          .as("v_q4"))
  }

  /** Time-weighted average per key (the irregular-series mean a plain
    * AVG gets wrong: a value that HELD for an hour must weigh 60× one
    * that held for a minute): step-function integral of the q4 value
    * over each key's own [first, last] span, divided by the span —
    * `twa_q4 = (Σ vᵢ·(tᵢ₊₁ − tᵢ)) div (t_last − t_first)`, ALL integer
    * arithmetic (epoch seconds × q4 longs, floor division), so the
    * result is engine-exact. Keys whose span is zero (a single event,
    * or all events in one second) emit a null twa rather than a
    * division blow-up.
    *
    * Scale shape: one key-hash exchange for the `lead` window (narrow
    * within each key's sorted slice), then a map-side-combined
    * per-key aggregate. */
  def timeWeightedAvg(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", valueCol: String = "value",
      tieCol: String = "event_id"): DataFrame = {
    RangeJoin.requireTs(events, tsCol, "timeWeightedAvg")
    val w = Window.partitionBy($"_k").orderBy($"es", col(tieCol))
    events
      .select(col(keyCol).as("_k"),
        expr(s"unix_micros(cast($tsCol AS TIMESTAMP)) div 1000000").as("es"),
        col(tieCol),
        floor(col(valueCol) * lit(10000.0)).cast("long").as("_v_q4"))
      .withColumn("_dt", lead($"es", 1).over(w) - $"es") // null on last
      .groupBy($"_k")
      .agg(count(lit(1)).as("n_events"),
        min($"es").as("start_es"), max($"es").as("end_es"),
        sum($"_v_q4" * $"_dt").as("_num"))
      .select($"_k".as(keyCol), $"n_events", $"start_es", $"end_es",
        when($"end_es" > $"start_es",
          expr("_num div (end_es - start_es)")).as("twa_q4"))
  }

  /** Trailing-window anomaly flags per key: an observation is anomalous
    * when it deviates from its OWN recent history — the last `window`
    * observations strictly before it — by more than `k` standard
    * deviations, with at least `minObs` rows of history required (the
    * live-monitoring twin of [[graft.ext.Frequency.madOutliers]], which
    * judges against the whole group).
    *
    * The test is `dev² > k²·var` cross-multiplied to co-moment form:
    * `(v·n − s)² > k²·(n·ss − s²)` over the window's exact integer
    * count/sum/sum-of-squares of the q4 value. The co-moments are exact
    * BIGINT (bounded by window size × q4 domain); only the two final
    * squared terms — which can exceed 63 bits — evaluate in DOUBLE, one
    * fixed IEEE multiply-and-compare per row from identical integer
    * inputs, so the flag is engine-reproducible (the corrOls contract:
    * integers everywhere, floats only in the final formula).
    *
    * Scale shape: one key-hash exchange for the window; all three
    * co-moments ride the SAME frame spec, narrow within each key's
    * sorted slice. Returns every input row with `(v_q4, w_n, w_sum_q4,
    * is_anomaly)` attached. */
  def anomalies(events: DataFrame, window: Int = 20, minObs: Int = 5,
      k: Int = 3, keyCol: String = "user_id", tsCol: String = "ts",
      valueCol: String = "value", tieCol: String = "event_id"): DataFrame = {
    RangeJoin.requireTs(events, tsCol, "anomalies")
    require(window >= 1 && minObs >= 2 && k >= 1,
      s"need window >= 1, minObs >= 2, k >= 1; got $window/$minObs/$k")
    val w = Window.partitionBy($"_k").orderBy($"_us", col(tieCol))
      .rowsBetween(-window, -1)
    val n = count($"v_q4").over(w)
    val s = sum($"v_q4").over(w)
    val ss = sum($"v_q4" * $"v_q4").over(w)
    val dev = ($"v_q4" * $"w_n" - $"w_s").cast("double")
    val spread = ($"w_n" * $"w_ss" - $"w_s" * $"w_s").cast("double")
    events
      .select(col(keyCol).as("_k"),
        expr(s"unix_micros(cast($tsCol AS TIMESTAMP))").as("_us"), col(tieCol),
        floor(col(valueCol) * lit(10000.0)).cast("long").as("v_q4"))
      .withColumn("w_n", n).withColumn("w_s", s).withColumn("w_ss", ss)
      .select($"_k".as(keyCol), col(tieCol), $"v_q4",
        $"w_n", coalesce($"w_s", lit(0L)).as("w_sum_q4"),
        coalesce($"w_n" >= minObs && dev * dev > lit(k.toDouble * k) * spread,
          lit(false)).as("is_anomaly"))
  }

  /** Lag-k autocorrelation of each group's DAILY COUNT series — the
    * seasonality detector (is traffic weekly-periodic? did the crawl
    * cadence drift?) next to [[anomalies]] (pointwise) and the KS/KL
    * drift monitors (distributional). Sample autocorrelation
    *   r_k = Σ_{d≤n−k}(c_d − c̄)(c_{d+k} − c̄) ∕ Σ_d(c_d − c̄)²
    * in EXACT integers, multiplied through by n²: dev_d = n·c_d − S,
    * numerator·n² = Σ dev_d·dev_{d+k}, denominator·n² = n²Q − n·S².
    * Deviations are signed; plain truncating integer division is
    * IDENTICAL in Spark (`div`) and DuckDB (`//`) on negatives (both
    * truncate toward zero — verified; only *rounding* division
    * diverges), so `r_bp = (10000·num) div den` hash-gates.
    *
    * The series is DENSE: each group's [min, max] observed-day span is
    * gap-filled with zero counts (autocorrelation over a sparse series
    * would silently stitch non-adjacent days together). A group shorter
    * than the lag simply has no (group, lag) row; a constant series has
    * den = 0 → null r_bp.
    *
    * Scale shape: raw events collapse to one row per (group, day) in a
    * map-side-combined aggregate FIRST — a year is ≤ 366 rows per group
    * no matter the corpus size — so the grid explode, the per-group
    * stats broadcast, and the lag self-join (equi on (group, probe-day))
    * all run on frames of series size, not event size. */
  /** CUSUM changepoint detection over each group's dense daily-count
    * series — "WHEN did the level shift" next to [[autocorrelation]]
    * ("is it periodic") and the KS drift monitor ("did the distribution
    * move"): with dev_d = n·c_d − S (the n-scaled deviation used across
    * the integer-stats ops), the cumulative sum K_t = Σ_{d≤t} dev_d =
    * n·S_t − t·S peaks in absolute value at the most likely single
    * changepoint (CUSUM / binary-segmentation step 1, Page 1954). The
    * mean shift across the cut is EXACTLY K_t ∕ (t·(n−t)) per day —
    * emitted as signed q4 with truncating division (identical in both
    * engines). The last index is excluded (K_n ≡ 0); ties take the
    * earliest day. Groups with < 2 days have no row.
    *
    * Scale shape: identical to autocorrelation — events collapse to
    * (group, day) first; one group-keyed ordered window for the prefix
    * sum + one argmax window, both at series size. */
  def changepoint(events: DataFrame, groupCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    RangeJoin.requireTs(events, tsCol, "changepoint")
    val dayUs = 86400L * 1000000L
    val daily = events
      .select(col(groupCol).as("g"),
        expr(s"unix_micros(cast($tsCol AS TIMESTAMP)) div $dayUs").as("d"))
      .groupBy($"g", $"d").agg(count(lit(1)).as("c"))
    val grid = daily.groupBy($"g").agg(min($"d").as("d0"), max($"d").as("d1"))
      .select($"g", explode(sequence($"d0", $"d1")).as("d"))
    val series = grid.join(daily, Seq("g", "d"), "left")
      .select($"g", $"d", coalesce($"c", lit(0L)).as("c"))
    val stats = series.groupBy($"g").agg(count(lit(1)).as("n"),
      sum($"c").as("s"))
    val wPrefix = Window.partitionBy($"g").orderBy($"d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRank = Window.partitionBy($"g").orderBy($"_kabs".desc, $"d")
    series.join(broadcast(stats), Seq("g"))
      .withColumn("_t", count(lit(1)).over(wPrefix))
      .withColumn("_st", sum($"c").over(wPrefix))
      .withColumn("_k", $"n" * $"_st" - $"_t" * $"s")
      .where($"_t" < $"n") // K_n is identically 0
      .withColumn("_kabs", abs($"_k"))
      .withColumn("_rk", row_number().over(wRank))
      .where($"_rk" === 1)
      .select($"g".as(groupCol), $"n".as("n_days"), $"d".as("cp_day"),
        $"_kabs".as("k_abs"),
        expr("(10000 * _k) div (_t * (n - _t))").as("shift_q4"))
  }

  /** Dense per-group daily-count series: events collapse to one row per
    * (group, day) in a map-side-combined count, then each group's own
    * [min, max] day span zero-fills its gaps (never a global calendar).
    * The shared first stage of every daily-series operator here
    * (autocorrelation, backtest, residuals, Theil–Sen): everything
    * downstream runs at series size, not event volume. Returns
    * (g, d, c, d0, d1). */
  private def dailySeries(events: DataFrame, groupCol: String,
      tsCol: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val daily = events
      .select(col(groupCol).as("g"),
        expr(s"unix_micros(cast($tsCol AS TIMESTAMP)) div $dayUs").as("d"))
      .groupBy($"g", $"d").agg(count(lit(1)).as("c"))
    val grid = daily.groupBy($"g").agg(min($"d").as("d0"), max($"d").as("d1"))
      .select($"g", $"d0", $"d1", explode(sequence($"d0", $"d1")).as("d"))
    grid.join(daily, Seq("g", "d"), "left")
      .select($"g", $"d", coalesce($"c", lit(0L)).as("c"), $"d0", $"d1")
  }

  /** Trailing exponentially-weighted moving average of each group's
    * dense daily-count series, in EXACT integer arithmetic: day t gets
    *
    *   ewma_q4 = (10⁴ · Σ_{i∈avail} c(t−i)·2^(span−1−i))
    *               div (Σ_{i∈avail} 2^(span−1−i))
    *
    * — power-of-two weights (decay ratio 1/2 per day) over the last
    * `span` days, the denominator restricted to lags inside the
    * group's own span (the "adjusted" EWMA start-up, so early days
    * average what exists instead of assuming zero history). Exact
    * because every weight is a shift and the one division is floor —
    * a float α-recurrence is order-dependent and can't hash
    * cross-engine.
    *
    * Scale shape: events collapse to per-(group, day) counts first, so
    * everything downstream is series-sized; the trailing window is a
    * span-fan-out equi-join on (g, d−lag) — never a row-offset window
    * over raw events. */
  def ewma(events: DataFrame, span: Int = 14,
      groupCol: String = "event_type", tsCol: String = "ts"): DataFrame = {
    RangeJoin.requireTs(events, tsCol, "ewma")
    // span cap keeps the fixed-point headroom honest: Σ c·2^(span−1)
    // then ×10⁴ must stay under 2⁶³ — at span 30 that still allows
    // ~8.5e8 events per group-day before overflow
    require(span >= 1 && span <= 30, s"span must be in [1, 30], got $span")
    val series = dailySeries(events, groupCol, tsCol).persistScoped
    val lags = series.select($"g", $"d", $"c")
      .withColumn("lag", explode(sequence(lit(0), lit(span - 1))))
      .select($"g", ($"d" + $"lag").as("d"),
        expr(s"c * shiftleft(1L, ${span - 1} - lag)").as("wc"),
        expr(s"shiftleft(1L, ${span - 1} - lag)").as("w"))
    series.join(lags.groupBy($"g", $"d").agg(
        sum($"wc").as("num"), sum($"w").as("den")), Seq("g", "d"))
      .select($"g".as(groupCol), $"d", $"c",
        expr("(10000 * num) div den").as("ewma_q4"))
  }

  /** CLASSICAL additive seasonal decomposition of each group's dense
    * daily-count series (Persons 1919 / the moving-average step of
    * STL without loess): count = trend + seasonal + residual, all in
    * exact q4 fixed point so the decomposition hash-gates cross-engine.
    *
    *  - `trend_q4`   = (10⁴·Σ window) div period over the CENTERED
    *                   period-wide window — null on the ⌊period∕2⌋ edge
    *                   days (no partial-window estimates: a shrinking
    *                   window would bias the edges and every engine
    *                   would bias them differently),
    *  - `seasonal_q4`= per (group, day-of-period) truncated mean of the
    *                   detrended series, then CENTERED per group
    *                   (seasonal components sum to ~0 so trend keeps
    *                   the level),
    *  - `resid_q4`   = 10⁴·c − trend − seasonal where trend exists.
    *
    * Truncating `div` on signed values is identical in Spark and DuckDB
    * (the ev17 autocorrelation contract), so every component is exact.
    *
    * Scale shape: events collapse to one (group, day) row in a map-side
    * -combined count FIRST, so the centered window, the per-(group,
    * phase) aggregate (≤ period rows per group), and the phase join-back
    * all run at series size — a year is ≤ 366 rows per group no matter
    * the corpus; the seasonal table broadcasts. */
  def seasonalDecompose(events: DataFrame, period: Int = 7,
      groupCol: String = "event_type", tsCol: String = "ts"): DataFrame = {
    RangeJoin.requireTs(events, tsCol, "seasonalDecompose")
    require(period >= 3 && period % 2 == 1,
      s"period must be odd >= 3 for a centered window, got $period")
    val half = period / 2
    val series = dailySeries(events, groupCol, tsCol)
    val wC = Window.partitionBy($"g").orderBy($"d")
      .rowsBetween(-half, half)
    val tr = series
      .withColumn("_wn", count(lit(1)).over(wC))
      .withColumn("_ws", sum($"c").over(wC))
      .withColumn("trend_q4",
        when($"_wn" === period, expr(s"(10000 * _ws) div $period")))
      .withColumn("_dow", expr(s"d % $period"))
      .persistScoped // read twice: seasonal estimation + final join-back
    val sRaw = tr.where($"trend_q4".isNotNull)
      .withColumn("_det", lit(10000L) * $"c" - $"trend_q4")
      .groupBy($"g", $"_dow")
      .agg(sum($"_det").as("_ds"), count(lit(1)).as("_dn"))
      .withColumn("_sraw", expr("_ds div _dn"))
    val sCtr = sRaw.groupBy($"g")
      .agg(sum($"_sraw").as("_ss"), count(lit(1)).as("_sn"))
    val seas = sRaw.join(sCtr, Seq("g"))
      .select($"g", $"_dow",
        ($"_sraw" - expr("_ss div _sn")).as("seasonal_q4"))
    tr.join(broadcast(seas), Seq("g", "_dow"), "left")
      .select($"g".as(groupCol), $"d", $"c", $"trend_q4", $"seasonal_q4",
        when($"trend_q4".isNotNull,
          lit(10000L) * $"c" - $"trend_q4" - $"seasonal_q4").as("resid_q4"))
  }

  /** Burst segmentation of each group's dense daily-count series —
    * [[graft.functions.BurstStates]] (integer two-state Viterbi,
    * Kleinberg-style) applied per group: baseline level μ₀ = the
    * group's LOWER MEDIAN count (order statistic ⌈n∕2⌉ — integer, both
    * engines agree), burst level 2μ₀+1, switch penalty γ = μ₀+1
    * (adaptive: switching must beat a median-sized residual). Answers
    * "WHICH days are a sustained burst" where ev7's pointwise z-flag
    * answers "is this single observation odd" and ev20's CUSUM answers
    * "where did the level shift once" — the path cost makes isolated
    * spikes stay baseline and sustained elevation flip, with the
    * switch count explicitly penalized.
    *
    * Scale shape: events collapse to (group, day) FIRST; each group's
    * bounded series (≤ 366/year) collects into ONE array row and the
    * DP runs in-row — group-cardinality rows carry arrays, raw events
    * never reshuffle twice. */
  def burstSegments(events: DataFrame, groupCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    RangeJoin.requireTs(events, tsCol, "burstSegments")
    import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpr}
    val series = dailySeries(events, groupCol, tsCol)
    val agg = series.groupBy($"g")
      .agg(sort_array(collect_list(struct($"d", $"c"))).as("dc"))
      .withColumn("cs", expr("transform(dc, x -> x.c)"))
      .withColumn("mu0",
        expr("element_at(array_sort(cs), cast((size(cs) + 1) div 2 as int))"))
    val states = toColumn(graft.functions.BurstStates(
      toExpr($"cs"), toExpr($"mu0"), toExpr($"mu0" + 1L)))
    agg.withColumn("st", states)
      .select($"g", $"mu0", posexplode(expr("arrays_zip(dc, st)")))
      .select($"g".as(groupCol), col("col.dc.d").as("d"),
        col("col.dc.c").as("c"), $"mu0", col("col.st").as("state"))
  }

  /** Full-series seasonal residuals: for every day with a lag-`season`
    * ancestor inside its group's span, the actual count, the
    * seasonal-naive forecast (the count `season` days earlier), and the
    * signed error — the input frame for residual-based anomaly flags
    * ([[graft.ext.Frequency.madOutliers]] over `e`) and the full-series
    * twin of [[seasonalBacktest]]'s holdout readout. */
  def seasonalResiduals(events: DataFrame, season: Int = 7,
      groupCol: String = "event_type", tsCol: String = "ts"): DataFrame = {
    RangeJoin.requireTs(events, tsCol, "seasonalResiduals")
    require(season >= 1, s"season must be >= 1, got $season")
    val series = dailySeries(events, groupCol, tsCol).persistScoped
    val fc = series.select($"g", ($"d" + season).as("d"), $"c".as("f"))
    series.where($"d" - season >= $"d0")
      .join(fc, Seq("g", "d"))
      .select($"g".as(groupCol), $"d", $"c", $"f", ($"c" - $"f").as("e"))
  }

  /** Seasonal-naive forecast backtest — per group, predict each of the
    * last `horizon` days of the dense daily-count series with the count
    * observed `season` days earlier (the lag-7 "same weekday last week"
    * baseline every real forecaster is judged against), and report the
    * holdout error profile:
    *  - `n_eval`    — evaluated days (horizon days with a lag-`season`
    *                  ancestor inside the series),
    *  - `mae_q4`    — ⌊10⁴·Σ|actual−forecast| ∕ n⌋,
    *  - `bias_q4`   — 10⁴·Σ(actual−forecast) div n, toward-zero
    *                  truncating division (verified identical in Spark
    *                  `div` and DuckDB `//` on negatives — the ev17
    *                  autocorrelation contract),
    *  - `smape_bp`  — mean of per-day ⌊10⁴·|e| ∕ (a+f)⌋ (0 when a+f=0),
    *                  the scale-free miss rate.
    *
    * Scale shape: raw events collapse to one row per (group, day) in a
    * map-side-combined count FIRST; the forecast join is a self-join of
    * that day-grained series on the same (group, day) key family; the
    * readout is one group aggregate. Nothing downstream of the first
    * aggregate sees event volume. All integer. */
  def seasonalBacktest(events: DataFrame, season: Int = 7,
      horizon: Int = 14, groupCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    RangeJoin.requireTs(events, tsCol, "seasonalBacktest")
    require(season >= 1, s"season must be >= 1, got $season")
    require(horizon >= 1, s"horizon must be >= 1, got $horizon")
    val series = dailySeries(events, groupCol, tsCol)
    val fc = series.select($"g", ($"d" + season).as("d"), $"c".as("f"))
    val eval0 = series
      .where($"d" > $"d1" - horizon && $"d" - season >= $"d0")
      .join(fc, Seq("g", "d"))
      .select($"g", ($"c" - $"f").as("e"), $"c", $"f",
        when($"c" + $"f" === 0L, lit(0L))
          .otherwise(expr("(10000 * abs(c - f)) div (c + f)")).as("sm"))
    eval0.groupBy($"g")
      .agg(count(lit(1)).as("n_eval"),
        sum(abs($"e")).as("_ae"), sum($"e").as("_se"), sum($"sm").as("_sm"))
      .select($"g".as(groupCol), $"n_eval",
        expr("(10000 * _ae) div n_eval").as("mae_q4"),
        expr("(10000 * _se) div n_eval").as("bias_q4"),
        expr("_sm div n_eval").as("smape_bp"))
  }

  /** Theil–Sen robust trend per group: the MEDIAN of all pairwise
    * slopes of the dense daily-count series — the slope estimator that
    * shrugs off the outlier days a least-squares fit chases
    * ([[graft.ops.Moments.corrOls]] is the parametric twin). Slopes are
    * quantized to q6 (`slope_q6 = (10⁶·(c₂−c₁)) div (d₂−d₁)`, toward-
    * zero truncation, identical in both engines) and the median is the
    * LOWER median (order statistic ⌈n∕2⌉) so the result is an exact
    * order statistic, never an average of two.
    *
    * Scale shape: events collapse to (group, day) counts first; the
    * pairwise slope set is days²-per-group — SERIES-sized, not
    * corpus-sized (3 years of days ≈ 600k pairs per group; longer
    * horizons first downsample to weekly buckets). The median is a
    * per-group window over that bounded pair set. */
  def theilSen(events: DataFrame, groupCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    RangeJoin.requireTs(events, tsCol, "theilSen")
    import org.apache.spark.sql.expressions.Window
    val series = dailySeries(events, groupCol, tsCol)
      .select($"g", $"d", $"c")
      .persistScoped // both sides of the pair join read this
    val slopes = series.toDF("g", "d_a", "c_a")
      .join(series.toDF("g", "d_b", "c_b"), Seq("g"))
      .where($"d_b" > $"d_a")
      .select($"g",
        expr("(1000000 * (c_b - c_a)) div (d_b - d_a)").as("s"))
    val w = Window.partitionBy($"g").orderBy($"s")
    slopes
      .select($"g", $"s",
        row_number().over(w).cast("long").as("_rn"),
        count(lit(1)).over(Window.partitionBy($"g")).as("n_pairs"))
      .where($"_rn" === expr("(n_pairs + 1) div 2"))
      .select($"g".as(groupCol), $"n_pairs", $"s".as("slope_q6"))
  }

  def autocorrelation(events: DataFrame, maxLag: Int = 7,
      groupCol: String = "event_type", tsCol: String = "ts"): DataFrame = {
    RangeJoin.requireTs(events, tsCol, "autocorrelation")
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val series = dailySeries(events, groupCol, tsCol)
      .select($"g", $"d", $"c")
    val stats = series.groupBy($"g").agg(count(lit(1)).as("n"),
      sum($"c").as("s"), sum($"c" * $"c").as("q"))
    val dev = series.join(broadcast(stats), Seq("g"))
      .select($"g", $"d", ($"n" * $"c" - $"s").as("dev"), $"n",
        ($"n" * $"n" * $"q" - $"n" * $"s" * $"s").as("den"))
    val probes = dev
      .select($"g", $"d", $"dev", $"n", $"den",
        explode(array((1 to maxLag).map(l => lit(l.toLong)): _*)).as("lag"))
      .select($"g", $"lag", ($"d" + $"lag").as("d_b"),
        $"dev".as("dev_a"), $"n", $"den")
    val rhs = dev.select($"g", $"d".as("d_b"), $"dev".as("dev_b"))
    probes.join(rhs, Seq("g", "d_b"))
      .groupBy($"g", $"lag")
      .agg(max($"n").as("n_days"), count(lit(1)).as("n_pairs"),
        sum($"dev_a" * $"dev_b").as("_num"), max($"den").as("_den"))
      .select($"g".as(groupCol), $"lag", $"n_days", $"n_pairs",
        when($"_den" === 0L, lit(null).cast("long"))
          .otherwise(expr("(10000 * _num) div _den")).as("r_bp"))
  }
}
