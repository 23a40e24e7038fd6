package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, QueryGroup, Tables}
import graft.ops.RankStats

/** Rank/contingency statistics (SURVEY §7.9 eval-audit family) as
  * oracle-checked queries: AUC, Gini, Spearman, chi-square,
  * Mann–Kendall, weighted median, t-closeness — every statistic in
  * exact integer arithmetic ([[graft.ops.RankStats]],
  * [[graft.ops.Anonymize.tCloseness]]), so DuckDB reproduces each one
  * bit-for-bit. */
object StatQueries extends QueryGroup {

  import Tables.load

  /** ext_auc_rank — per-source ROC AUC (Mann–Whitney U, midrank ties,
    * exact bp) of doc length as a predictor of lang='en': the
    * score-separability readout a quality-classifier eval needs. */
  def aucRank(spark: SparkSession, dir: String): DataFrame =
    RankStats.auc(load(spark, dir, "documents"),
        $"source", $"lang" === "en", $"n_chars")
      .withColumnRenamed("g", "source")
      .orderBy($"source")

  private val aucRankSql =
    """WITH r AS (
      |  SELECT source, lang = 'en' AS pos,
      |         rank() OVER (PARTITION BY source ORDER BY n_chars) AS rk,
      |         count(*) OVER (PARTITION BY source, n_chars) AS c
      |  FROM documents),
      |a AS (
      |  SELECT source,
      |         sum(CASE WHEN pos THEN 1 ELSE 0 END)::BIGINT AS n_pos,
      |         sum(CASE WHEN pos THEN 0 ELSE 1 END)::BIGINT AS n_neg,
      |         sum(CASE WHEN pos THEN 2 * rk + c - 1 ELSE 0 END)::BIGINT AS r1x2
      |  FROM r GROUP BY source)
      |SELECT source, n_pos, n_neg,
      |       ((10000 * (r1x2 - n_pos * (n_pos + 1)))
      |        // (2 * n_pos * n_neg))::BIGINT AS auc_bp
      |FROM a WHERE n_pos > 0 AND n_neg > 0
      |ORDER BY source""".stripMargin

  /** ext_gini — Gini coefficient of per-customer order counts within
    * each market segment (exact bp over non-negative integers): the
    * inequality-of-contribution audit (is one customer half the
    * volume?), the per-group form of the Pareto readout. */
  def giniQ(spark: SparkSession, dir: String): DataFrame = {
    val cnt = load(spark, dir, "orders")
      .groupBy($"o_custkey").agg(count(lit(1)).as("n_orders"))
    val seg = cnt.join(load(spark, dir, "customer")
        .select($"c_custkey", $"c_mktsegment"),
      $"o_custkey" === $"c_custkey")
    RankStats.gini(seg, $"c_mktsegment", $"n_orders", $"o_custkey")
      .withColumnRenamed("g", "mktsegment")
      .orderBy($"mktsegment")
  }

  private val giniSql =
    """WITH cnt AS (
      |  SELECT o_custkey, count(*)::BIGINT AS x FROM orders GROUP BY o_custkey),
      |j AS (
      |  SELECT c.c_mktsegment AS g, cnt.x, c.c_custkey AS t
      |  FROM cnt JOIN customer c ON cnt.o_custkey = c.c_custkey),
      |r AS (SELECT g, x,
      |        row_number() OVER (PARTITION BY g ORDER BY x, t) AS i FROM j),
      |a AS (SELECT g, count(*)::BIGINT AS n, sum(x)::BIGINT AS total,
      |             sum(i * x)::BIGINT AS six
      |      FROM r GROUP BY g)
      |SELECT g AS mktsegment, n, total,
      |       ((10000 * (2 * six - (n + 1) * total)) // (n * total))::BIGINT
      |         AS gini_bp
      |FROM a WHERE total > 0 ORDER BY mktsegment""".stripMargin

  /** ext_spearman — Spearman rank correlation (signed squared bp,
    * staged q6 quantization, midrank ties) between quantity and
    * extended price per return flag: the monotone-association readout
    * that is immune to the price column's heavy skew. */
  def spearmanQ(spark: SparkSession, dir: String): DataFrame =
    RankStats.spearman(load(spark, dir, "lineitem"),
        $"l_returnflag", $"l_quantity", $"l_extendedprice")
      .withColumnRenamed("g", "returnflag")
      .orderBy($"returnflag")

  /** ext_kendall_tau — Kendall's τ-b trend concordance per event type
    * over the DAILY count series (epoch-day vs count — the collapsed,
    * calendar-bounded input [[graft.ops.RankStats.kendallTau]]'s
    * cell-pair shape wants): the tie-corrected rank-agreement readout
    * next to ext_spearman's ρ and ev36's Mann–Kendall S. C/D and tie
    * sums exact; τ-b through one identical-structure double. */
  def kendallTauQ(spark: SparkSession, dir: String): DataFrame = {
    val daily = load(spark, dir, "events")
      .groupBy($"event_type",
        expr("unix_micros(ts) div 86400000000").as("d"))
      .agg(count(lit(1)).as("cnt"))
    RankStats.kendallTau(daily, $"event_type", $"d", $"cnt")
      .withColumnRenamed("g", "event_type")
      .orderBy($"event_type")
  }

  private val kendallTauSql =
    """WITH daily AS (
      |  SELECT event_type AS g,
      |         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS x,
      |         count(*)::BIGINT AS y
      |  FROM events GROUP BY 1, 2),
      |cells AS (
      |  SELECT g, x, y, count(*)::BIGINT AS c FROM daily GROUP BY 1, 2, 3),
      |cd AS (
      |  SELECT a.g,
      |    sum(CASE WHEN a.x < b.x AND a.y < b.y THEN a.c * b.c ELSE 0 END)::BIGINT AS c_conc,
      |    sum(CASE WHEN a.x < b.x AND a.y > b.y THEN a.c * b.c ELSE 0 END)::BIGINT AS d_disc
      |  FROM cells a JOIN cells b
      |    ON a.g = b.g AND (a.x < b.x OR (a.x = b.x AND a.y < b.y))
      |  GROUP BY a.g),
      |tx AS (SELECT g, sum(t * (t - 1) // 2)::BIGINT AS n1 FROM (
      |         SELECT g, x, sum(c) AS t FROM cells GROUP BY 1, 2) GROUP BY g),
      |ty AS (SELECT g, sum(t * (t - 1) // 2)::BIGINT AS n2 FROM (
      |         SELECT g, y, sum(c) AS t FROM cells GROUP BY 1, 2) GROUP BY g),
      |nn AS (SELECT g, sum(c)::BIGINT AS n FROM cells GROUP BY g)
      |SELECT nn.g AS event_type, nn.n,
      |       coalesce(cd.c_conc, 0)::BIGINT AS c_conc,
      |       coalesce(cd.d_disc, 0)::BIGINT AS d_disc,
      |       tx.n1, ty.n2,
      |       (nn.n * (nn.n - 1) // 2)::BIGINT AS n0,
      |       (CASE WHEN nn.n * (nn.n - 1) // 2 - tx.n1 <= 0
      |               OR nn.n * (nn.n - 1) // 2 - ty.n2 <= 0 THEN 0
      |        ELSE floor((10000.0::DOUBLE * (coalesce(cd.c_conc, 0) - coalesce(cd.d_disc, 0))) /
      |          sqrt((nn.n * (nn.n - 1) // 2 - tx.n1)::DOUBLE *
      |               (nn.n * (nn.n - 1) // 2 - ty.n2)::DOUBLE))
      |        END)::BIGINT AS tau_b_bp
      |FROM nn LEFT JOIN cd ON nn.g = cd.g
      |JOIN tx ON nn.g = tx.g JOIN ty ON nn.g = ty.g
      |ORDER BY event_type""".stripMargin

  private val spearmanSql =
    """WITH r AS (
      |  SELECT l_returnflag AS g,
      |    count(*) OVER (PARTITION BY l_returnflag) AS gn,
      |    rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rkx,
      |    count(*) OVER (PARTITION BY l_returnflag, l_quantity) AS ctx,
      |    rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rky,
      |    count(*) OVER (PARTITION BY l_returnflag, l_extendedprice) AS cty
      |  FROM lineitem),
      |q AS (
      |  SELECT g,
      |    ((1000000 * (2 * rkx + ctx - 1)) // (2 * gn))::HUGEINT AS rx,
      |    ((1000000 * (2 * rky + cty - 1)) // (2 * gn))::HUGEINT AS ry
      |  FROM r),
      |s AS (SELECT g, count(*)::HUGEINT AS n, sum(rx) AS sx, sum(ry) AS sy,
      |             sum(rx * ry) AS sxy, sum(rx * rx) AS sxx, sum(ry * ry) AS syy
      |      FROM q GROUP BY g),
      |t AS (SELECT g, n::BIGINT AS n,
      |        CASE WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 1 END AS sgn,
      |        abs(n * sxy - sx * sy) // (n * n) AS cov_qa,
      |        (n * sxx - sx * sx) // (n * n) AS vx_q,
      |        (n * syy - sy * sy) // (n * n) AS vy_q
      |      FROM s)
      |SELECT g AS returnflag, n,
      |       (sgn * ((10000 * cov_qa * cov_qa) // (vx_q * vy_q)))::BIGINT
      |         AS rho2_bp
      |FROM t WHERE vx_q > 0 AND vy_q > 0 ORDER BY returnflag""".stripMargin

  /** ext_chi_square — Pearson chi-square of independence between order
    * priority and order status (exact q6 over the full marginal grid):
    * the drift test between two categorical columns. */
  def chiSquareQ(spark: SparkSession, dir: String): DataFrame =
    RankStats.chiSquare(load(spark, dir, "orders"),
      $"o_orderpriority", $"o_orderstatus")

  private val chiSquareSql =
    """WITH cells AS (
      |  SELECT o_orderpriority AS a, o_orderstatus AS b, count(*)::HUGEINT AS o
      |  FROM orders GROUP BY 1, 2),
      |ra AS (SELECT a, sum(o) AS r FROM cells GROUP BY a),
      |cb AS (SELECT b, sum(o) AS c FROM cells GROUP BY b),
      |t AS (SELECT sum(o) AS n FROM cells),
      |g AS (
      |  SELECT coalesce(cells.o, 0::HUGEINT) AS o, ra.r, cb.c, t.n
      |  FROM ra CROSS JOIN cb CROSS JOIN t
      |  LEFT JOIN cells ON cells.a = ra.a AND cells.b = cb.b)
      |SELECT max(n)::BIGINT AS n,
      |       (((SELECT count(*) FROM ra) - 1) *
      |        ((SELECT count(*) FROM cb) - 1))::BIGINT AS df,
      |       sum((1000000 * (o * n - r * c) * (o * n - r * c))
      |           // (n * r * c))::BIGINT AS chi2_q6
      |FROM g""".stripMargin

  /** ext_t_closeness — t-closeness audit ([[graft.ops.Anonymize.tCloseness]])
    * of the (lang, source) quasi-identifier groups over the ordered
    * n_chars-bucket sensitive attribute: exact-bp EMD between each
    * group's length distribution and the corpus's. */
  def tClosenessQ(spark: SparkSession, dir: String): DataFrame = {
    val rel = load(spark, dir, "documents")
      .select(coalesce($"lang", lit("∅")).as("lang"),
        coalesce($"source", lit("∅")).as("source"),
        expr("n_chars div 100").as("lv"))
    graft.ops.Anonymize.tCloseness(rel, Seq("lang", "source"), "lv", tBp = 2000)
      .orderBy($"lang", $"source")
  }

  private val tClosenessSql =
    """WITH rel AS (
      |  SELECT coalesce(lang, '∅') AS lang, coalesce(source, '∅') AS source,
      |         (n_chars // 100) AS lv
      |  FROM documents),
      |lvl AS (SELECT lv, count(*)::BIGINT AS cg FROM rel GROUP BY lv),
      |grp AS (SELECT lang, source, count(*)::BIGINT AS n_rows
      |        FROM rel GROUP BY 1, 2),
      |cel AS (SELECT lang, source, lv, count(*)::BIGINT AS c
      |        FROM rel GROUP BY 1, 2, 3),
      |tot AS (SELECT count(*)::BIGINT AS nn, count(DISTINCT lv)::BIGINT AS m
      |        FROM rel),
      |grid AS (
      |  SELECT g.lang, g.source, g.n_rows, l.lv, l.cg, coalesce(c.c, 0) AS c
      |  FROM grp g CROSS JOIN lvl l
      |  LEFT JOIN cel c ON c.lang = g.lang AND c.source = g.source AND c.lv = l.lv),
      |cum AS (
      |  SELECT lang, source, n_rows,
      |    sum(c) OVER (PARTITION BY lang, source ORDER BY lv
      |                 ROWS UNBOUNDED PRECEDING)::HUGEINT AS cum_c,
      |    sum(cg) OVER (PARTITION BY lang, source ORDER BY lv
      |                  ROWS UNBOUNDED PRECEDING)::HUGEINT AS cum_cg
      |  FROM grid),
      |emd AS (
      |  SELECT c.lang, c.source, c.n_rows,
      |         sum(abs(c.cum_c * t.nn - c.cum_cg * c.n_rows)) AS emd_num
      |  FROM cum c CROSS JOIN tot t GROUP BY 1, 2, 3)
      |SELECT e.lang, e.source, e.n_rows,
      |       ((10000 * emd_num)
      |        // (greatest(t.m - 1, 1)::HUGEINT * e.n_rows * t.nn))::BIGINT AS t_bp,
      |       ((10000 * emd_num)
      |        // (greatest(t.m - 1, 1)::HUGEINT * e.n_rows * t.nn)) <= 2000 AS t_ok
      |FROM emd e CROSS JOIN tot t
      |ORDER BY lang, source""".stripMargin

  /** ext_weighted_median — per-nation weighted median of customer
    * balance cents, weighted by the customer's order count (the
    * activity-weighted central balance): exact lower weighted median
    * through a partitioned cumulative-weight window. */
  def weightedMedianQ(spark: SparkSession, dir: String): DataFrame = {
    val w = load(spark, dir, "orders")
      .groupBy($"o_custkey").agg(count(lit(1)).as("n_orders"))
    val j = load(spark, dir, "customer")
      .join(w, $"c_custkey" === $"o_custkey")
      .select($"c_nationkey".cast("long").as("nationkey"),
        expr("cast(round(c_acctbal * 100) as bigint)").as("cents"),
        $"n_orders", $"c_custkey")
    RankStats.weightedMedian(j, $"nationkey", $"cents", $"n_orders", $"c_custkey")
      .withColumnRenamed("g", "nationkey")
      .orderBy($"nationkey")
  }

  private val weightedMedianSql =
    """WITH w AS (
      |  SELECT o_custkey, count(*)::BIGINT AS n_orders FROM orders GROUP BY 1),
      |j AS (
      |  SELECT c.c_nationkey::BIGINT AS g,
      |         round(c.c_acctbal * 100)::BIGINT AS x,
      |         w.n_orders AS wt, c.c_custkey AS t
      |  FROM customer c JOIN w ON c.c_custkey = w.o_custkey),
      |c AS (
      |  SELECT g, x,
      |    sum(wt) OVER (PARTITION BY g ORDER BY x, t
      |                  ROWS UNBOUNDED PRECEDING) AS cum,
      |    sum(wt) OVER (PARTITION BY g) AS tot
      |  FROM j)
      |SELECT g AS nationkey, min(x)::BIGINT AS w_median,
      |       max(tot)::BIGINT AS total_w
      |FROM c WHERE 2 * cum >= tot
      |GROUP BY g ORDER BY nationkey""".stripMargin

  /** ev36_mann_kendall — Mann–Kendall trend statistic per event type
    * over the daily event-count series (exact; S left undivided): the
    * nonparametric is-activity-trending test. The O(n²) pair join runs
    * on the collapsed per-day series, never raw events. */
  def mannKendallQ(spark: SparkSession, dir: String): DataFrame = {
    val series = load(spark, dir, "events")
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("x"))
    RankStats.mannKendall(series, "event_type", "d", "x")
      .withColumnRenamed("g", "event_type")
      .orderBy($"event_type")
  }

  private val mannKendallSql =
    """WITH s AS (
      |  SELECT event_type AS g, ts::DATE AS d, count(*)::BIGINT AS x
      |  FROM events GROUP BY 1, 2)
      |SELECT a.g AS event_type, count(*)::BIGINT AS n_pairs,
      |       sum(CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1
      |                ELSE 0 END)::BIGINT AS s_stat
      |FROM s a JOIN s b ON a.g = b.g AND a.d < b.d
      |GROUP BY a.g ORDER BY event_type""".stripMargin

  /** ev51_theil_sen — Theil–Sen robust trend per event type over the
    * daily event-count series ([[RankStats.theilSen]]): the median
    * pairwise slope (q6, sign-before-division) plus the median-residual
    * intercept — Mann–Kendall's "how steep" companion, tolerant of ~29%
    * outlier days. Pair join runs on the collapsed series only. */
  def theilSenQ(spark: SparkSession, dir: String): DataFrame = {
    val series = load(spark, dir, "events")
      .groupBy($"event_type", expr("unix_micros(ts) div 86400000000").as("d"))
      .agg(count(lit(1)).as("x"))
    RankStats.theilSen(series, "event_type", "d", "x")
      .orderBy($"event_type")
  }

  private val theilSenSql =
    """WITH s AS MATERIALIZED (
      |  SELECT event_type AS g,
      |         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
      |         count(*)::BIGINT AS x
      |  FROM events GROUP BY 1, 2),
      |p AS (
      |  SELECT a.g,
      |         (CASE WHEN b.x >= a.x
      |               THEN (1000000 * (b.x - a.x)) // (b.d - a.d)
      |               ELSE -((1000000 * (a.x - b.x)) // (b.d - a.d))
      |          END)::BIGINT AS slope_q6
      |  FROM s a JOIN s b ON a.g = b.g AND a.d < b.d),
      |m AS (
      |  SELECT g, np::BIGINT AS n_pairs, slope_q6 FROM (
      |    SELECT g, slope_q6,
      |           row_number() OVER (PARTITION BY g ORDER BY slope_q6) AS rn,
      |           count(*) OVER (PARTITION BY g) AS np
      |    FROM p) WHERE rn = (np + 1) // 2),
      |r AS (
      |  SELECT s.g, m.n_pairs, m.slope_q6,
      |         (1000000 * s.x - m.slope_q6 * s.d)::BIGINT AS r_q6
      |  FROM s JOIN m ON s.g = m.g)
      |SELECT g AS event_type, n::BIGINT AS n_points, n_pairs, slope_q6,
      |       r_q6 AS intercept_q6
      |FROM (
      |  SELECT g, n_pairs, slope_q6, r_q6,
      |         row_number() OVER (PARTITION BY g ORDER BY r_q6) AS rn,
      |         count(*) OVER (PARTITION BY g) AS n
      |  FROM r) WHERE rn = (n + 1) // 2
      |ORDER BY event_type""".stripMargin

  /** ext_pass_at_k — the unbiased pass@k estimator (Chen et al. 2021,
    * [[RankStats.passAtK]]) over a synthetic eval harness: tasks =
    * user_id mod 50, an attempt is correct when value ≥ 30. Exact
    * integer falling factorials; the oracle replays the clamped
    * products and the single truncating division. */
  def passAtKQ(spark: SparkSession, dir: String): DataFrame =
    RankStats.passAtK(
      load(spark, dir, "events").withColumn("task", $"user_id" % 50),
      "task", $"value" >= 30.0, k = 3)
      .orderBy($"task")

  private val passAtKSql = {
    val num = (0 until 3).map(i =>
      s"(CASE WHEN $i < k_eff THEN greatest(n - c - $i, 0) ELSE 1 END)")
      .mkString(" * ")
    val den = (0 until 3).map(i =>
      s"(CASE WHEN $i < k_eff THEN n - $i ELSE 1 END)")
      .mkString(" * ")
    s"""WITH t AS (
       |  SELECT (user_id % 50)::BIGINT AS task, count(*)::BIGINT AS n,
       |         sum(CASE WHEN value >= 30.0 THEN 1 ELSE 0 END)::BIGINT AS c
       |  FROM events GROUP BY 1),
       |e AS (SELECT task, n, c, least(3, n)::BIGINT AS k_eff FROM t)
       |SELECT task, n, c, k_eff,
       |       (CASE WHEN n >= 1
       |             THEN 10000 - (10000 * ($num)) // ($den)
       |             ELSE 0 END)::BIGINT AS pass_bp
       |FROM e ORDER BY task""".stripMargin
  }

  /** ext_digit_uniformity — chi-square goodness-of-fit of the LAST
    * digit of order-amount cents against uniform (Nigrini's last-digit
    * fraud screen, the companion to ext_benford_audit's first-digit
    * law): invented amounts over-represent round digits. */
  def digitUniformity(spark: SparkSession, dir: String): DataFrame =
    RankStats.chiSquareGof(load(spark, dir, "orders"),
      expr("cast(round(o_totalprice * 100) as bigint) % 10"), 0L to 9L)

  private val digitUniformitySql =
    """WITH c AS (
      |  SELECT (round(o_totalprice * 100)::BIGINT % 10) AS d FROM orders),
      |o AS (SELECT d, count(*)::HUGEINT AS o FROM c GROUP BY d),
      |spine AS (SELECT unnest(range(0, 10)) AS d),
      |t AS (SELECT count(*)::HUGEINT AS n FROM c)
      |SELECT max(t.n)::BIGINT AS n, 10::BIGINT AS k,
      |       sum((1000000 * (10 * coalesce(o.o, 0) - t.n)
      |                    * (10 * coalesce(o.o, 0) - t.n))
      |           // (10 * t.n))::BIGINT AS chi2_q6
      |FROM spine LEFT JOIN o USING (d) CROSS JOIN t""".stripMargin

  /** ext_merkle_audit — two-level Merkle fingerprint
    * ([[graft.ops.Integrity.merkle]]) of the documents table, bucketed
    * by doc_id-century: per-bucket content hash plus the table root,
    * layout-independent (replica diff = compare roots, then buckets). */
  def merkleAudit(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Integrity.merkle(load(spark, dir, "documents"),
        "doc_id", "text", expr("doc_id div 100"))
      .orderBy($"bucket")

  private val merkleAuditSql =
    """WITH l AS (
      |  SELECT doc_id // 100 AS bucket, doc_id,
      |         md5(doc_id::VARCHAR || ':' || text) AS leaf
      |  FROM documents),
      |b AS (
      |  SELECT bucket, count(*)::BIGINT AS n_rows,
      |         md5(string_agg(leaf, '' ORDER BY doc_id)) AS bucket_hash
      |  FROM l GROUP BY bucket),
      |r AS (SELECT md5(string_agg(bucket_hash, '' ORDER BY bucket)) AS root
      |      FROM b)
      |SELECT b.bucket, b.n_rows, b.bucket_hash, r.root
      |FROM b CROSS JOIN r ORDER BY bucket""".stripMargin

  /** ext_fd_discovery — single-scan all-pairs functional-dependency
    * profile ([[graft.ops.Profile.fdDiscover]]) over the documents
    * attribute set: the two doc_id-determined pairs genuinely hold
    * (doc_id is the key), the other four directed pairs report their
    * violation census. */
  def fdDiscovery(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Profile.fdDiscover(load(spark, dir, "documents"),
        Seq("doc_id", "lang", "source"))
      .orderBy($"det_col", $"dep_col")

  private val fdDiscoverySql = {
    val cols = Seq("doc_id", "lang", "source")
    val pairs = for (a <- cols; b <- cols if a != b) yield (a, b)
    pairs.map { case (a, b) =>
      s"""SELECT '$a' AS det_col, '$b' AS dep_col,
         |  count(*)::BIGINT AS n_groups,
         |  coalesce(sum(CASE WHEN nd > 1 THEN 1 END), 0)::BIGINT AS n_viol_groups,
         |  coalesce(sum(CASE WHEN nd > 1 THEN rws END), 0)::BIGINT AS n_viol_rows,
         |  coalesce(sum(CASE WHEN nd > 1 THEN 1 END), 0) = 0 AS holds
         |FROM (SELECT coalesce($a::VARCHAR, '∅') AS dv,
         |             count(DISTINCT coalesce($b::VARCHAR, '∅')) AS nd,
         |             count(*) AS rws
         |      FROM documents GROUP BY 1)""".stripMargin
    }.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
      "\n) ORDER BY det_col, dep_col")
  }

  /** ev37_pattern_match — negative event-pattern match (the
    * MATCH_RECOGNIZE shape): purchases preceded by a view with NO
    * error in between, per user — funnels (ev1) chain earliest
    * timestamps, but "A then B with no C between" needs the
    * latest-A-vs-latest-C comparison. One per-user ordered window
    * pass: a row_number spine, then running max of the last view/error
    * positions. */
  def patternMatch(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = load(spark, dir, "events")
      .select($"event_id", $"user_id", $"event_type", $"ts")
    val spine = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val run = Window.partitionBy($"user_id").orderBy($"rn")
      .rowsBetween(Window.unboundedPreceding, 0)
    ev.withColumn("rn", row_number().over(spine))
      .withColumn("lv",
        max(when($"event_type" === "view", $"rn")).over(run))
      .withColumn("le",
        max(when($"event_type" === "error", $"rn")).over(run))
      .where($"event_type" === "purchase" && $"lv".isNotNull &&
        ($"le".isNull || $"le" < $"lv"))
      .select($"event_id", $"user_id")
      .orderBy($"event_id")
  }

  private val patternMatchSql =
    """WITH r AS (
      |  SELECT event_id, user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events),
      |m AS (
      |  SELECT event_id, user_id, event_type,
      |    max(CASE WHEN event_type = 'view' THEN rn END)
      |      OVER (PARTITION BY user_id ORDER BY rn
      |            ROWS UNBOUNDED PRECEDING) AS lv,
      |    max(CASE WHEN event_type = 'error' THEN rn END)
      |      OVER (PARTITION BY user_id ORDER BY rn
      |            ROWS UNBOUNDED PRECEDING) AS le
      |  FROM r)
      |SELECT event_id, user_id FROM m
      |WHERE event_type = 'purchase' AND lv IS NOT NULL
      |  AND (le IS NULL OR le < lv)
      |ORDER BY event_id""".stripMargin

  /** Card-shaped fixtures for the Luhn screen: four Luhn-VALID PANs
    * and four invalid ones (last digit bumped), injected into synthetic
    * payment sentences — the sf documents have no digit runs. Literal
    * on both sides, the GeoQueries fixture convention. */
  private val luhnCards = Seq(
    ("4532015112830366", true), ("5425233430109903", true),
    ("374245455400126", true), ("6011000991300009", true),
    ("4532015112830367", false), ("5425233430109904", false),
    ("374245455400127", false), ("6011000991300008", false))

  /** ext_pii_luhn — PII screen for payment-card numbers: 13–19 digit
    * runs extracted per document, validated with the Luhn checksum
    * (mod-10, the check real PAN detectors gate on — digit runs that
    * fail it are order ids, not cards), and the valid ones redacted to
    * their last four. Spark's codegen `luhn_check` against a DuckDB
    * list-fold reimplementation of the same published algorithm. */
  def piiLuhn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits.{newProductEncoder, localSeqToDatasetHolder}
    val cards = luhnCards.zipWithIndex
      .map { case ((pan, _), i) => (i.toLong, pan) }
      .toDS().toDF("slot", "pan")
    val docs = load(spark, dir, "documents").where($"doc_id" < 8)
      .join(broadcast(cards), $"doc_id" % 8 === $"slot")
      .select($"doc_id",
        concat(lit("invoice ref "), $"pan", lit(" thanks")).as("text"))
    docs
      .select($"doc_id", $"text",
        explode(expr("regexp_extract_all(text, '[0-9]{13,19}', 0)")).as("pan"))
      .withColumn("luhn_ok", expr("luhn_check(pan)"))
      .select($"doc_id", $"pan", $"luhn_ok",
        when($"luhn_ok", regexp_replace($"text", $"pan",
          concat(lit("####-"), substring($"pan", -4, 4))))
          .otherwise($"text").as("redacted"))
      .orderBy($"doc_id", $"pan")
  }

  private val piiLuhnSql = {
    val values = luhnCards.zipWithIndex
      .map { case ((pan, _), i) => s"($i, '$pan')" }.mkString(", ")
    s"""WITH cards(slot, pan) AS (VALUES $values),
       |d AS (
       |  SELECT doc_id, 'invoice ref ' || c.pan || ' thanks' AS text
       |  FROM documents JOIN cards c ON doc_id % 8 = c.slot
       |  WHERE doc_id < 8),
       |hits AS (
       |  SELECT doc_id, text,
       |         unnest(regexp_extract_all(text, '[0-9]{13,19}', 0)) AS pan
       |  FROM d),
       |checked AS (
       |  SELECT doc_id, text, pan,
       |    (list_sum(list_transform(range(1, length(pan) + 1), i ->
       |       CASE WHEN (length(pan) - i) % 2 = 1
       |            THEN (2 * substr(pan, i::INT, 1)::INT) // 10
       |               + (2 * substr(pan, i::INT, 1)::INT) % 10
       |            ELSE substr(pan, i::INT, 1)::INT END)) % 10 = 0) AS luhn_ok
       |  FROM hits)
       |SELECT doc_id, pan, luhn_ok,
       |       CASE WHEN luhn_ok
       |            THEN replace(text, pan, '####-' || substr(pan, -4, 4))
       |            ELSE text END AS redacted
       |FROM checked ORDER BY doc_id, pan""".stripMargin
  }

  /** ev38_iso_week — weekly revenue rolled up on the ISO week calendar
    * (ISO-8601 week-dates): the year-boundary days that belong to the
    * other year's week 52/1 land in the RIGHT bucket — grouping by
    * (year, weekofyear) double-counts weeks that straddle Jan 1, the
    * classic calendar rollup bug. Revenue summed exactly in cents. */
  def isoWeek(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "orders")
      .groupBy(expr("extract(YEAROFWEEK FROM o_orderdate)").as("iso_year"),
        weekofyear($"o_orderdate").cast("long").as("iso_week"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("cents"))
      .orderBy($"iso_year", $"iso_week")

  private val isoWeekSql =
    """SELECT isoyear(o_orderdate)::BIGINT AS iso_year,
      |       weekofyear(o_orderdate)::BIGINT AS iso_week,
      |       count(*)::BIGINT AS n_orders,
      |       sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS cents
      |FROM orders
      |GROUP BY 1, 2 ORDER BY iso_year, iso_week""".stripMargin

  /** w9_running_distinct — per-user RUNNING count of distinct event
    * types over time: distinct-so-far as a window column. No
    * count(DISTINCT) window (Spark refuses it; a naive rewrite buffers
    * sets) — the first-occurrence flag (row_number = 1 per (user,
    * type)) summed cumulatively is exact and stays a pair of plain
    * windows over one shuffle. */
  def runningDistinct(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = load(spark, dir, "events")
      .select($"event_id", $"user_id", $"event_type", $"ts")
    val firstW = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"ts", $"event_id")
    val cumW = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    ev.withColumn("_first",
        when(row_number().over(firstW) === 1, 1L).otherwise(0L))
      .withColumn("types_so_far", sum($"_first").over(cumW))
      .select($"event_id", $"user_id", $"types_so_far")
      .orderBy($"event_id")
  }

  private val runningDistinctSql =
    """WITH f AS (
      |  SELECT event_id, user_id,
      |    CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
      |                                 ORDER BY ts, event_id) = 1
      |         THEN 1 ELSE 0 END AS fst,
      |    ts
      |  FROM events)
      |SELECT event_id, user_id,
      |       sum(fst) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                      ROWS UNBOUNDED PRECEDING)::BIGINT AS types_so_far
      |FROM f ORDER BY event_id""".stripMargin

  /** ext_quantile_normalize — quantile normalization
    * ([[graft.ext.Frequency.quantileNormalize]], Bolstad 2003): every
    * market segment's balance distribution mapped onto the pooled
    * global one. The oracle resolves the same midrank indices against
    * the same cumulative spine through DuckDB's native ASOF join — an
    * independent formulation of the rank→order-statistic lookup. */
  def quantileNormalizeQ(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Frequency.quantileNormalize(
        load(spark, dir, "customer").select($"c_custkey", $"c_mktsegment",
          expr("cast(round(c_acctbal * 100) as bigint)").as("cents")),
        "c_mktsegment", "cents", "c_custkey")
      .select($"id".as("custkey"), $"g".as("mktsegment"), $"v".as("cents"),
        $"norm_v".cast("long").as("norm_cents"))
      .orderBy($"custkey")

  private val quantileNormalizeSql =
    """WITH b AS (
      |  SELECT c_custkey AS id, c_mktsegment AS g,
      |         round(c_acctbal * 100)::BIGINT AS v
      |  FROM customer),
      |n AS (SELECT count(*)::BIGINT AS nn FROM b),
      |r AS (
      |  SELECT id, g, v,
      |    row_number() OVER (PARTITION BY g ORDER BY v, id) AS r,
      |    count(*) OVER (PARTITION BY g) AS cg
      |  FROM b),
      |ix AS (
      |  SELECT id, g, v,
      |         ((2 * r - 1) * n.nn + 2 * cg - 1) // (2 * cg) AS idx
      |  FROM r CROSS JOIN n),
      |sp AS (SELECT v AS sv, count(*) AS c FROM b GROUP BY v),
      |sr AS (SELECT sv, (sum(c) OVER (ORDER BY sv) - c + 1)::BIGINT AS rk
      |       FROM sp)
      |SELECT ix.id AS custkey, ix.g AS mktsegment, ix.v AS cents,
      |       sr.sv AS norm_cents
      |FROM ix ASOF JOIN sr ON sr.rk <= ix.idx
      |ORDER BY custkey""".stripMargin

  /** ext_ri_audit — referential-integrity census
    * ([[graft.ops.Integrity.riAudit]]) over the schema's three FK
    * relations: orphaned children, null FKs, and childless parents per
    * relation, anti/semi-join shaped. */
  def riAuditQ(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Integrity.riAudit
    riAudit("orders_customer", load(spark, dir, "orders"), "o_custkey",
        load(spark, dir, "customer"), "c_custkey")
      .unionByName(riAudit("lineitem_orders", load(spark, dir, "lineitem"),
        "l_orderkey", load(spark, dir, "orders"), "o_orderkey"))
      .unionByName(riAudit("lineitem_part", load(spark, dir, "lineitem"),
        "l_partkey", load(spark, dir, "part"), "p_partkey"))
      .orderBy($"relation")
  }

  private val riAuditSql = {
    def one(name: String, child: String, fk: String, parent: String,
        pk: String) =
      s"""SELECT '$name' AS relation,
         |  (SELECT count(*) FROM $child)::BIGINT AS n_child,
         |  (SELECT count(*) FROM $child WHERE $fk IS NULL)::BIGINT AS n_null_fk,
         |  (SELECT count(*) FROM $child c WHERE c.$fk IS NOT NULL
         |     AND NOT EXISTS (SELECT 1 FROM $parent p WHERE p.$pk = c.$fk)
         |  )::BIGINT AS n_orphans,
         |  (SELECT count(*) FROM $parent)::BIGINT AS n_parents,
         |  (SELECT count(*) FROM $parent p
         |     WHERE NOT EXISTS (SELECT 1 FROM $child c WHERE c.$fk = p.$pk)
         |  )::BIGINT AS n_childless,
         |  (SELECT count(*) FROM $child c WHERE c.$fk IS NOT NULL
         |     AND NOT EXISTS (SELECT 1 FROM $parent p WHERE p.$pk = c.$fk)) = 0
         |    AS ri_holds""".stripMargin
    Seq(
      one("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
      one("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      one("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"))
      .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY relation")
  }

  /** ext_simpsons_flag — Simpson's-paradox audit
    * ([[graft.ops.Moments.simpsonsFlag]]): per market segment, does the
    * per-customer (order count → balance) trend run AGAINST the pooled
    * trend? Signs from exact integer covariance numerators, no floats
    * anywhere. */
  def simpsonsFlagQ(spark: SparkSession, dir: String): DataFrame = {
    val cnt = load(spark, dir, "orders")
      .groupBy($"o_custkey").agg(count(lit(1)).as("n_orders"))
    val j = load(spark, dir, "customer")
      .join(cnt, $"c_custkey" === $"o_custkey")
      .select($"c_mktsegment", $"n_orders",
        expr("cast(round(c_acctbal * 100) as bigint)").as("cents"))
    graft.ops.Moments.simpsonsFlag(j, "c_mktsegment", "n_orders", "cents")
      .withColumnRenamed("c_mktsegment", "mktsegment")
      .orderBy($"mktsegment")
  }

  private val simpsonsFlagSql =
    """WITH cnt AS (
      |  SELECT o_custkey, count(*)::BIGINT AS x FROM orders GROUP BY 1),
      |j AS (
      |  SELECT c.c_mktsegment AS g, cnt.x,
      |         round(c.c_acctbal * 100)::BIGINT AS y
      |  FROM customer c JOIN cnt ON c.c_custkey = cnt.o_custkey),
      |b AS (
      |  SELECT g, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
      |         sum(y)::BIGINT AS sy, sum(x * y)::BIGINT AS sxy
      |  FROM j GROUP BY g),
      |p AS (
      |  SELECT sign(sum(n) * sum(sxy) - sum(sx) * sum(sy))::BIGINT
      |           AS pooled_sign
      |  FROM b)
      |SELECT b.g AS mktsegment, b.n,
      |       sign(b.n * b.sxy - b.sx * b.sy)::BIGINT AS slope_sign,
      |       p.pooled_sign,
      |       (sign(b.n * b.sxy - b.sx * b.sy) <> 0 AND p.pooled_sign <> 0
      |        AND sign(b.n * b.sxy - b.sx * b.sy) = -p.pooled_sign)
      |         AS reversal
      |FROM b CROSS JOIN p ORDER BY mktsegment""".stripMargin

  /** ev39_downtime — gap/downtime detection: per user, every
    * inter-event gap over one hour, with the bounding events — the
    * monitoring readout behind "when did this feed go quiet". One
    * partitioned lag window. */
  def downtime(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    load(spark, dir, "events")
      .select($"event_id", $"user_id", $"ts")
      .withColumn("_prev", lag($"ts", 1).over(w))
      .withColumn("gap_s",
        expr("(unix_micros(ts) - unix_micros(_prev)) div 1000000"))
      .where($"gap_s" > 3600L)
      .select($"event_id", $"user_id", $"_prev".as("down_start"),
        $"ts".as("down_end"), $"gap_s")
      .orderBy($"event_id")
  }

  private val downtimeSql =
    """WITH g AS (
      |  SELECT event_id, user_id,
      |    lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
      |                                     ORDER BY ts, event_id) AS prev,
      |    CAST(ts AS TIMESTAMP) AS ts
      |  FROM events)
      |SELECT event_id, user_id, prev AS down_start, ts AS down_end,
      |       (epoch_us(ts) - epoch_us(prev)) // 1000000 AS gap_s
      |FROM g
      |WHERE (epoch_us(ts) - epoch_us(prev)) // 1000000 > 3600
      |ORDER BY event_id""".stripMargin

  /** ev40_peak_concurrency — maximum concurrently-open click windows
    * per user via the EVENT-SWEEP trick: each interval becomes a +1 at
    * its start and a −1 past its end, a running sum over (t, delta
    * DESC) counts the open intervals at every instant, and the max is
    * the peak — never an interval self-join. Closed bounds: a window
    * starting the instant another ends counts both. */
  def peakConcurrency(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clicks = load(spark, dir, "events")
      .where($"event_type" === "click")
      .select($"user_id", $"ts".as("s"),
        ($"ts" + expr("INTERVAL 15 MINUTES")).as("e"))
    val deltas = clicks.select($"user_id", $"s".as("t"), lit(1L).as("d"))
      .unionByName(clicks.select($"user_id",
        ($"e" + expr("INTERVAL 1 MICROSECOND")).as("t"), lit(-1L).as("d")))
    val w = Window.partitionBy($"user_id").orderBy($"t", $"d".desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    deltas
      .withColumn("_open", sum($"d").over(w))
      .groupBy($"user_id")
      .agg(max($"_open").as("peak"), (count(lit(1)) / 2).cast("long").as("n_windows"))
      .orderBy($"user_id")
  }

  private val peakConcurrencySql =
    """WITH c AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS s,
      |         CAST(ts AS TIMESTAMP) + INTERVAL 15 MINUTE AS e
      |  FROM events WHERE event_type = 'click'),
      |d AS (
      |  SELECT user_id, s AS t, 1 AS d FROM c
      |  UNION ALL
      |  SELECT user_id, e + INTERVAL 1 MICROSECOND AS t, -1 AS d FROM c),
      |r AS (
      |  SELECT user_id,
      |    sum(d) OVER (PARTITION BY user_id ORDER BY t, d DESC
      |                 ROWS UNBOUNDED PRECEDING) AS open
      |  FROM d)
      |SELECT user_id, max(open)::BIGINT AS peak,
      |       (count(*) // 2)::BIGINT AS n_windows
      |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin

  /** s26_cdc_compact — net-effect change-feed compaction
    * ([[graft.ops.Cdc.compact]]): a synthetic three-checkpoint op log
    * over customers (everyone inserted, evens updated, every sixth
    * deleted) collapses to the one op per key a consumer replays;
    * born-and-died keys classify `none` and are filtered as the
    * consumer would. */
  def cdcCompact(spark: SparkSession, dir: String): DataFrame = {
    val c = load(spark, dir, "customer")
    val log = c.select($"c_custkey".as("k"), lit(1L).as("seq"),
        lit("I").as("op"), $"c_mktsegment".as("v"))
      .unionByName(c.where($"c_custkey" % 2 === 0)
        .select($"c_custkey".as("k"), lit(2L).as("seq"),
          lit("U").as("op"), lit("MOVED").as("v")))
      .unionByName(c.where($"c_custkey" % 6 === 0)
        .select($"c_custkey".as("k"), lit(3L).as("seq"),
          lit("D").as("op"), lit(null).cast("string").as("v")))
    graft.ops.Cdc.compact(log, "k", "seq", "op", "v")
      .where($"net_op" =!= "none")
      .orderBy($"k")
  }

  private val cdcCompactSql =
    """WITH log AS (
      |  SELECT c_custkey AS k, 1 AS seq, 'I' AS op, c_mktsegment AS v
      |  FROM customer
      |  UNION ALL
      |  SELECT c_custkey, 2, 'U', 'MOVED' FROM customer WHERE c_custkey % 2 = 0
      |  UNION ALL
      |  SELECT c_custkey, 3, 'D', NULL FROM customer WHERE c_custkey % 6 = 0),
      |agg AS (
      |  SELECT k, arg_min(op, seq) AS f, arg_max(op, seq) AS l,
      |         arg_max(v, CASE WHEN op <> 'D' THEN seq END) AS final_val,
      |         count(*)::BIGINT AS n_ops
      |  FROM log GROUP BY k),
      |net AS (
      |  SELECT k,
      |    CASE WHEN f = 'I' AND l = 'D' THEN 'none'
      |         WHEN f = 'I' THEN 'insert'
      |         WHEN l = 'D' THEN 'delete'
      |         ELSE 'update' END AS net_op,
      |    final_val, n_ops
      |  FROM agg)
      |SELECT k, net_op, final_val, n_ops FROM net
      |WHERE net_op <> 'none' ORDER BY k""".stripMargin

  /** URL fixtures for the canonicalization screen: pairs that MUST
    * collide after normalization plus control cases, literal on both
    * sides. */
  private val urlFixtures = Seq(
    1L -> "HTTP://Example.COM:80/path/",
    2L -> "http://example.com/path",
    3L -> "https://example.com/search?utm_source=x&b=2&a=1",
    4L -> "https://example.com/search?a=1&b=2&fbclid=zzz",
    5L -> "https://Sub.Example.com:443/P/Q/",
    6L -> "example.com/x",
    7L -> "http://example.com/path?only=utm#frag",
    8L -> "https://example.com:8443/keep-port/",
    9L -> "http://example.com/p#a?b=1")

  /** ext_url_canonical — URL canonicalization before web-corpus dedup
    * ([[graft.functions.CleaningFunctions.canonicalizeUrl]]): two
    * crawls of one page collide after scheme/host lowering, default-
    * port and trailing-slash stripping, tracking-param removal, and
    * query-param sorting. Output includes each canonical form's
    * collision count — the dedup readout itself. */
  def urlCanonical(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits.{newProductEncoder, localSeqToDatasetHolder}
    val urls = urlFixtures.toDS().toDF("id", "url")
    urls
      .withColumn("canon_url",
        graft.functions.CleaningFunctions.canonicalizeUrl($"url"))
      .withColumn("n_dups",
        count(lit(1)).over(Window.partitionBy($"canon_url")))
      .select($"id", $"canon_url", $"n_dups")
      .orderBy($"id")
  }

  private val urlCanonicalSql = {
    val values = urlFixtures
      .map { case (i, u) => s"($i, '$u')" }.mkString(", ")
    s"""WITH u(id, url) AS (VALUES $values),
       |p AS (
       |  SELECT id, url,
       |    lower(coalesce(nullif(regexp_extract(url,
       |      '^([A-Za-z][A-Za-z0-9+.-]*)://', 1), ''), 'http')) AS scheme,
       |    regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS a
       |  FROM u),
       |q AS (
       |  SELECT id, scheme,
       |    lower(regexp_extract(a, '^([^/?#]*)', 1)) AS hostport,
       |    regexp_replace(regexp_extract(a, '^[^/?#]*([^?#]*)', 1),
       |                   '/+$$', '') AS path,
       |    regexp_extract(regexp_replace(a, '#.*$$', ''), '\\?(.*)$$', 1) AS qs
       |  FROM p),
       |r AS (
       |  SELECT id, scheme,
       |    CASE WHEN scheme = 'http' AND hostport LIKE '%:80'
       |           THEN regexp_replace(hostport, ':80$$', '')
       |         WHEN scheme = 'https' AND hostport LIKE '%:443'
       |           THEN regexp_replace(hostport, ':443$$', '')
       |         ELSE hostport END AS host,
       |    path,
       |    coalesce(array_to_string(list_sort(list_filter(
       |      string_split(qs, '&'),
       |      x -> x <> '' AND NOT regexp_matches(x,
       |             '^(utm_[^=]*|fbclid)='))), '&'), '') AS params
       |  FROM q),
       |c AS (
       |  SELECT id, scheme || '://' || host || path ||
       |    CASE WHEN params = '' THEN '' ELSE '?' || params END AS canon_url
       |  FROM r)
       |SELECT id, canon_url,
       |       count(*) OVER (PARTITION BY canon_url)::BIGINT AS n_dups
       |FROM c ORDER BY id""".stripMargin
  }

  /** ext_quantile_groups — exact per-group quartiles (p25/p50/p75 of
    * balance cents per segment) with PINNED index semantics: the value
    * at row ⌈p·n⌉ of the group's (value, custkey) order — a partitioned
    * window + conditional min, never a global sort; the oracle spells
    * the identical index arithmetic rather than trusting either
    * engine's quantile_disc convention. */
  def quantileGroups(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"g").orderBy($"v", $"t")
    load(spark, dir, "customer")
      .select($"c_mktsegment".as("g"),
        expr("cast(round(c_acctbal * 100) as bigint)").as("v"),
        $"c_custkey".as("t"))
      .withColumn("_rn", row_number().over(w).cast("long"))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy($"g")))
      .groupBy($"g")
      .agg(max($"_n").as("n"),
        min(when($"_rn" === expr("(25 * _n + 99) div 100"), $"v")).as("p25"),
        min(when($"_rn" === expr("(50 * _n + 99) div 100"), $"v")).as("p50"),
        min(when($"_rn" === expr("(75 * _n + 99) div 100"), $"v")).as("p75"))
      .withColumnRenamed("g", "mktsegment")
      .orderBy($"mktsegment")
  }

  private val quantileGroupsSql =
    """WITH b AS (
      |  SELECT c_mktsegment AS g, round(c_acctbal * 100)::BIGINT AS v,
      |         c_custkey AS t
      |  FROM customer),
      |r AS (
      |  SELECT g, v,
      |    row_number() OVER (PARTITION BY g ORDER BY v, t) AS rn,
      |    count(*) OVER (PARTITION BY g) AS n
      |  FROM b)
      |SELECT g AS mktsegment, max(n)::BIGINT AS n,
      |       min(CASE WHEN rn = (25 * n + 99) // 100 THEN v END)::BIGINT AS p25,
      |       min(CASE WHEN rn = (50 * n + 99) // 100 THEN v END)::BIGINT AS p50,
      |       min(CASE WHEN rn = (75 * n + 99) // 100 THEN v END)::BIGINT AS p75
      |FROM r GROUP BY g ORDER BY mktsegment""".stripMargin

  /** ev41_bounce_rate — per-day bounce share: sessions (30-minute idle
    * gap) with exactly one event over all sessions that day, exact
    * basis points. Session ids from the gaps-and-islands cumulative
    * flag — one keyed window pass, the ev5 shape collapsed to the
    * classic web metric. */
  def bounceRate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val cum = byUser.rowsBetween(Window.unboundedPreceding, 0)
    load(spark, dir, "events")
      .select($"event_id", $"user_id", $"ts")
      .withColumn("_prev", lag($"ts", 1).over(byUser))
      .withColumn("_new", when($"_prev".isNull ||
        expr("unix_micros(ts) - unix_micros(_prev)") > 1800L * 1000000L, 1L)
        .otherwise(0L))
      .withColumn("_sid", sum($"_new").over(cum))
      .groupBy($"user_id", $"_sid")
      .agg(min(expr("unix_micros(ts) div 86400000000")).as("day"),
        count(lit(1)).as("_len"))
      .groupBy($"day")
      .agg(count(lit(1)).as("n_sessions"),
        sum(when($"_len" === 1L, 1L).otherwise(0L)).as("n_bounce"))
      .select($"day", $"n_sessions", $"n_bounce",
        expr("(10000 * n_bounce) div n_sessions").as("bounce_bp"))
      .orderBy($"day")
  }

  private val bounceRateSql =
    """WITH e AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
      |    lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS prev
      |  FROM events),
      |s AS (
      |  SELECT user_id, ts,
      |    sum(CASE WHEN prev IS NULL
      |             OR epoch_us(ts) - epoch_us(prev) > 1800000000
      |             THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM e),
      |g AS (
      |  SELECT user_id, sid,
      |         min(epoch_us(ts) // 86400000000) AS day,
      |         count(*)::BIGINT AS len
      |  FROM s GROUP BY user_id, sid)
      |SELECT day, count(*)::BIGINT AS n_sessions,
      |       sum(CASE WHEN len = 1 THEN 1 ELSE 0 END)::BIGINT AS n_bounce,
      |       ((10000 * sum(CASE WHEN len = 1 THEN 1 ELSE 0 END))
      |        // count(*))::BIGINT AS bounce_bp
      |FROM g GROUP BY day ORDER BY day""".stripMargin

  /** ext_vocab_growth — Heaps'-law vocabulary growth curve: distinct
    * terms among the first k documents (by doc_id) at geometric
    * checkpoints — the diminishing-returns readout behind "will more
    * data still grow the vocabulary". One token explode melted over
    * the checkpoint grid, distinct via a two-level aggregate (never
    * countDistinct's Expand over raw positions). */
  def vocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits.{newLongEncoder, localSeqToDatasetHolder}
    val checkpoints = Seq(25L, 50L, 100L, 200L, 400L).toDF("k")
    val terms = load(spark, dir, "documents")
      .select($"doc_id",
        explode(graft.ext.TextStats.tokens($"text")).as("term"))
      .where($"term" =!= "")
    terms.crossJoin(broadcast(checkpoints))
      .where($"doc_id" < $"k")
      .groupBy($"k", $"term").agg(count(lit(1)).as("_tf"))
      .groupBy($"k")
      .agg(count(lit(1)).as("n_distinct_terms"), sum($"_tf").as("n_tokens"))
      .orderBy($"k")
  }

  private val vocabGrowthSql =
    """WITH t AS (
      |  SELECT doc_id,
      |         unnest(string_split_regex(lower(coalesce(text, '')), '\s+'))
      |           AS term
      |  FROM documents),
      |tt AS (SELECT doc_id, term FROM t WHERE term <> ''),
      |ck AS (SELECT unnest([25, 50, 100, 200, 400]) AS k)
      |SELECT ck.k::BIGINT AS k,
      |       count(DISTINCT term)::BIGINT AS n_distinct_terms,
      |       count(*)::BIGINT AS n_tokens
      |FROM tt JOIN ck ON tt.doc_id < ck.k
      |GROUP BY ck.k ORDER BY k""".stripMargin

  /** w10_session_window_batch — Spark's native `session_window`
    * grouping in BATCH mode (st2's streaming sibling through the same
    * API): per (user, gap-merged session) the start instant and event
    * count. New session at gap ≥ 30 min (the window is
    * [ts, last + gap)), which the oracle's gaps-and-islands mirror
    * spells as `>=`. */
  def sessionWindowBatch(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .groupBy($"user_id",
        session_window($"ts", "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id",
        expr("unix_micros(sw.start)").as("session_start_us"), $"n_events")
      .orderBy($"user_id", $"session_start_us")

  private val sessionWindowBatchSql =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
      |    lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS prev
      |  FROM events),
      |s AS (
      |  SELECT user_id, ts,
      |    sum(CASE WHEN prev IS NULL
      |             OR epoch_us(ts) - epoch_us(prev) >= 1800000000
      |             THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts
      |            ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM e)
      |SELECT user_id, min(epoch_us(ts))::BIGINT AS session_start_us,
      |       count(*)::BIGINT AS n_events
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start_us""".stripMargin

  /** ev42_daily_p95 — per-day p95 of the event value at pinned
    * ⌈95n∕100⌉ index semantics: the SLA percentile readout, a
    * partitioned window + conditional min (the ext_quantile_groups
    * machinery on the time axis); the value passes through untouched
    * so the compare is exact. */
  def dailyP95(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDay = Window.partitionBy($"day").orderBy($"value", $"event_id")
    load(spark, dir, "events")
      .select($"event_id", $"value",
        expr("unix_micros(ts) div 86400000000").as("day"))
      .where($"value".isNotNull)
      .withColumn("_rn", row_number().over(byDay).cast("long"))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy($"day")))
      .groupBy($"day")
      .agg(max($"_n").as("n"),
        min(when($"_rn" === expr("(95 * _n + 99) div 100"), $"value"))
          .as("p95"))
      .orderBy($"day")
  }

  private val dailyP95Sql =
    """WITH b AS (
      |  SELECT event_id, value,
      |         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
      |  FROM events WHERE value IS NOT NULL),
      |r AS (
      |  SELECT day, value,
      |    row_number() OVER (PARTITION BY day ORDER BY value, event_id) AS rn,
      |    count(*) OVER (PARTITION BY day) AS n
      |  FROM b)
      |SELECT day, max(n)::BIGINT AS n,
      |       min(CASE WHEN rn = (95 * n + 99) // 100 THEN value END) AS p95
      |FROM r GROUP BY day ORDER BY day""".stripMargin

  /** ev43_window_funnel — windowed funnel depth (the ClickHouse
    * windowFunnel shape): per user, how many views reach a click
    * within 3 days, and how many of those reach a purchase within 3
    * days of THE CLICK — chained next-event hops, each hop one
    * [[graft.ops.AsofJoin.asofForward]] (never a per-anchor subquery).
    * The oracle chains DuckDB's native forward ASOF twice. */
  def windowFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = load(spark, dir, "events")
    val horizonUs = 3L * 86400L * 1000000L
    val views = ev.where($"event_type" === "view")
      .select($"event_id", $"user_id", $"ts")
    val clicks = ev.where($"event_type" === "click")
      .select($"user_id", $"ts")
    val purchases = ev.where($"event_type" === "purchase")
      .select($"user_id", $"ts")
    val hop1 = graft.ops.AsofJoin
      .asofForward(views, clicks, Seq("user_id"), "ts", rightPrefix = "c_")
      .withColumn("_click_ok", $"c_ts".isNotNull &&
        expr(s"unix_micros(c_ts) - unix_micros(ts) <= $horizonUs"))
    val anchors2 = hop1.where($"_click_ok")
      .select($"event_id".as("view_id"), $"user_id", $"c_ts".as("ts"))
    val hop2 = graft.ops.AsofJoin
      .asofForward(anchors2, purchases, Seq("user_id"), "ts",
        rightPrefix = "p_")
      .where($"p_ts".isNotNull &&
        expr(s"unix_micros(p_ts) - unix_micros(ts) <= $horizonUs"))
      .select($"view_id")
    hop1
      .join(hop2.withColumn("_p_ok", lit(1L)),
        hop1("event_id") === hop2("view_id"), "left")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_views"),
        sum(when($"_click_ok", 1L).otherwise(0L)).as("n_clicked"),
        sum(coalesce($"_p_ok", lit(0L))).as("n_purchased"))
      .orderBy($"user_id")
  }

  private val windowFunnelSql =
    """WITH v AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |           FROM events WHERE event_type = 'view'),
      |c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
      |      FROM events WHERE event_type = 'click'),
      |p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
      |      FROM events WHERE event_type = 'purchase'),
      |h1 AS (
      |  SELECT v.event_id, v.user_id, v.ts, c.ts AS c_ts,
      |         (c.ts IS NOT NULL AND
      |          epoch_us(c.ts) - epoch_us(v.ts) <= 259200000000) AS click_ok
      |  FROM v ASOF LEFT JOIN c
      |    ON v.user_id = c.user_id AND c.ts >= v.ts),
      |h2 AS (
      |  SELECT a.event_id AS view_id
      |  FROM (SELECT event_id, user_id, c_ts FROM h1 WHERE click_ok) a
      |  ASOF LEFT JOIN p ON a.user_id = p.user_id AND p.ts >= a.c_ts
      |  WHERE p.ts IS NOT NULL
      |    AND epoch_us(p.ts) - epoch_us(a.c_ts) <= 259200000000)
      |SELECT h1.user_id, count(*)::BIGINT AS n_views,
      |       sum(CASE WHEN h1.click_ok THEN 1 ELSE 0 END)::BIGINT AS n_clicked,
      |       sum(CASE WHEN h2.view_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
      |         AS n_purchased
      |FROM h1 LEFT JOIN h2 ON h1.event_id = h2.view_id
      |GROUP BY h1.user_id ORDER BY h1.user_id""".stripMargin

  /** o6_listagg — deterministic sorted list aggregation: per nation,
    * the five lexicographically-first customer names joined with '|'
    * (collect below an explicit sort_array + slice, never relying on
    * collect_list order) — the export formatting op whose
    * nondeterministic naive form is a classic cross-engine trap. */
  def listAgg(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "customer")
      .groupBy($"c_nationkey".cast("long").as("nationkey"))
      .agg(count(lit(1)).as("n"),
        array_join(slice(sort_array(collect_list($"c_name")), 1, 5), "|")
          .as("top5_names"))
      .orderBy($"nationkey")

  private val listAggSql =
    """SELECT c_nationkey::BIGINT AS nationkey, count(*)::BIGINT AS n,
      |       array_to_string(list_sort(list(c_name))[1:5], '|') AS top5_names
      |FROM customer GROUP BY c_nationkey ORDER BY nationkey""".stripMargin

  /** ev44_km_table — Kaplan–Meier survival table (Kaplan & Meier 1958)
    * for time-to-first-purchase since signup, right-censored at the
    * feed's end: per duration day, the at-risk count, events, and
    * censorings — the exact integer INGREDIENTS of the KM estimator
    * (the product-limit itself is a float a stats package derives;
    * the table is what the engine owes). At-risk counts are a suffix
    * sum over the aggregate-sized duration table, never the user
    * frame. */
  def kmTable(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = load(spark, dir, "events")
    val su = ev.where($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts").as("s"))
    val pu = ev.where($"event_type" === "purchase")
      .select($"user_id", $"ts".as("p"))
    val horizon = ev.agg(max($"ts").as("maxts"))
    val perUser = su.join(pu, Seq("user_id"), "left")
      .groupBy($"user_id", $"s")
      .agg(min(when($"p" >= $"s", $"p")).as("fp"))
      .crossJoin(broadcast(horizon))
      .select(
        when($"fp".isNotNull,
          expr("(unix_micros(fp) - unix_micros(s)) div 86400000000"))
          .otherwise(expr("(unix_micros(maxts) - unix_micros(s)) div 86400000000"))
          .as("dur"),
        $"fp".isNotNull.as("event"))
    val byDur = perUser.groupBy($"dur")
      .agg(sum(when($"event", 1L).otherwise(0L)).as("n_events"),
        sum(when($"event", 0L).otherwise(1L)).as("n_censored"))
    val suffix = Window.orderBy($"dur".desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    byDur
      .withColumn("n_at_risk",
        sum($"n_events" + $"n_censored").over(suffix))
      .select($"dur", $"n_at_risk", $"n_events", $"n_censored")
      .orderBy($"dur")
  }

  private val kmTableSql =
    """WITH su AS (
      |  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS s
      |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
      |pu AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS p
      |       FROM events WHERE event_type = 'purchase'),
      |h AS (SELECT max(CAST(ts AS TIMESTAMP)) AS maxts FROM events),
      |per_user AS (
      |  SELECT su.user_id, su.s,
      |         min(CASE WHEN pu.p >= su.s THEN pu.p END) AS fp
      |  FROM su LEFT JOIN pu ON su.user_id = pu.user_id
      |  GROUP BY su.user_id, su.s),
      |d AS (
      |  SELECT CASE WHEN fp IS NOT NULL
      |              THEN (epoch_us(fp) - epoch_us(s)) // 86400000000
      |              ELSE (epoch_us(h.maxts) - epoch_us(s)) // 86400000000
      |         END AS dur,
      |         fp IS NOT NULL AS event
      |  FROM per_user CROSS JOIN h),
      |byd AS (
      |  SELECT dur,
      |         sum(CASE WHEN event THEN 1 ELSE 0 END)::BIGINT AS n_events,
      |         sum(CASE WHEN event THEN 0 ELSE 1 END)::BIGINT AS n_censored
      |  FROM d GROUP BY dur)
      |SELECT dur,
      |       sum(n_events + n_censored)
      |         OVER (ORDER BY dur DESC ROWS UNBOUNDED PRECEDING)::BIGINT
      |         AS n_at_risk,
      |       n_events, n_censored
      |FROM byd ORDER BY dur""".stripMargin

  /** ext_ab_srm — sample-ratio-mismatch check (the FIRST validity gate
    * of every A/B readout: a skewed split invalidates the experiment
    * before any metric is read): md5-hash 50/50 assignment of
    * customers, then the chi-square goodness-of-fit of arm counts vs
    * uniform ([[graft.ops.RankStats.chiSquareGof]]). Same deterministic
    * assignment hash as the sampling family, so both engines place
    * every customer in the same arm. */
  def abSrm(spark: SparkSession, dir: String): DataFrame = {
    val arms = load(spark, dir, "customer")
      .select((graft.ext.Sampling.hashBucket($"c_custkey") % 2).as("arm"))
    RankStats.chiSquareGof(arms, $"arm", Seq(0L, 1L))
  }

  private val abSrmSql =
    """WITH arms AS (
      |  SELECT ((('0x' || substr(md5(c_custkey::VARCHAR), 1, 8))::BIGINT
      |            % 10000) % 2) AS arm
      |  FROM customer),
      |o AS (SELECT arm, count(*)::HUGEINT AS o FROM arms GROUP BY arm),
      |spine AS (SELECT unnest(range(0, 2)) AS arm),
      |t AS (SELECT count(*)::HUGEINT AS n FROM arms)
      |SELECT max(t.n)::BIGINT AS n, 2::BIGINT AS k,
      |       sum((1000000 * (2 * coalesce(o.o, 0) - t.n)
      |                    * (2 * coalesce(o.o, 0) - t.n))
      |           // (2 * t.n))::BIGINT AS chi2_q6
      |FROM spine LEFT JOIN o USING (arm) CROSS JOIN t""".stripMargin

  /** ev45_activity_heatmap — the day-of-week × hour activity matrix
    * per event type, on the ISO day numbering (Mon=1 … Sun=7) — the
    * one convention both engines share (bare dayofweek is Sun=1 in
    * Spark but Sun=0 in DuckDB, the classic calendar-matrix trap). */
  def activityHeatmap(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .groupBy($"event_type",
        expr("extract(DAYOFWEEK_ISO FROM ts)").cast("long").as("isodow"),
        hour($"ts").cast("long").as("hr"))
      .agg(count(lit(1)).as("n"))
      .orderBy($"event_type", $"isodow", $"hr")

  private val activityHeatmapSql =
    """SELECT event_type,
      |       isodow(CAST(ts AS TIMESTAMP))::BIGINT AS isodow,
      |       hour(CAST(ts AS TIMESTAMP))::BIGINT AS hr,
      |       count(*)::BIGINT AS n
      |FROM events
      |GROUP BY 1, 2, 3 ORDER BY event_type, isodow, hr""".stripMargin

  /** ev46_interarrival_profile — log₂-bucketed inter-arrival-time
    * histogram per event type (bucket = bit length of the gap in
    * seconds — integer log₂, no float log): burstiness at a glance,
    * the time-axis sibling of ext_length_profile. */
  def interarrivalProfile(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"event_type", $"user_id")
      .orderBy($"ts", $"event_id")
    load(spark, dir, "events")
      .select($"event_id", $"user_id", $"event_type", $"ts")
      .withColumn("_prev", lag($"ts", 1).over(w))
      .where($"_prev".isNotNull)
      .withColumn("_gap",
        expr("(unix_micros(ts) - unix_micros(_prev)) div 1000000"))
      .withColumn("bucket", when($"_gap" <= 0L, lit(0L))
        .otherwise(length(bin($"_gap")).cast("long")))
      .groupBy($"event_type", $"bucket")
      .agg(count(lit(1)).as("n"))
      .orderBy($"event_type", $"bucket")
  }

  private val interarrivalProfileSql =
    """WITH g AS (
      |  SELECT event_type,
      |    (epoch_us(CAST(ts AS TIMESTAMP)) -
      |     epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER (
      |       PARTITION BY event_type, user_id ORDER BY ts, event_id)))
      |      // 1000000 AS gap
      |  FROM events),
      |b AS (
      |  SELECT event_type,
      |         CASE WHEN gap <= 0 THEN 0
      |              ELSE length(bin(gap)) END::BIGINT AS bucket
      |  FROM g WHERE gap IS NOT NULL)
      |SELECT event_type, bucket, count(*)::BIGINT AS n
      |FROM b GROUP BY 1, 2 ORDER BY event_type, bucket""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("ext_ab_srm", abSrm, Some(abSrmSql)),
    QueryDef("ev45_activity_heatmap", activityHeatmap, Some(activityHeatmapSql)),
    QueryDef("ev46_interarrival_profile", interarrivalProfile,
      Some(interarrivalProfileSql)),
    QueryDef("ev44_km_table", kmTable, Some(kmTableSql)),
    QueryDef("ev43_window_funnel", windowFunnel, Some(windowFunnelSql)),
    QueryDef("o6_listagg", listAgg, Some(listAggSql)),
    QueryDef("w10_session_window_batch", sessionWindowBatch,
      Some(sessionWindowBatchSql)),
    QueryDef("ev42_daily_p95", dailyP95, Some(dailyP95Sql)),
    QueryDef("ext_quantile_groups", quantileGroups, Some(quantileGroupsSql)),
    QueryDef("ev41_bounce_rate", bounceRate, Some(bounceRateSql)),
    QueryDef("ext_vocab_growth", vocabGrowth, Some(vocabGrowthSql)),
    QueryDef("ext_url_canonical", urlCanonical, Some(urlCanonicalSql)),
    QueryDef("ev39_downtime", downtime, Some(downtimeSql)),
    QueryDef("ev40_peak_concurrency", peakConcurrency, Some(peakConcurrencySql)),
    QueryDef("s26_cdc_compact", cdcCompact, Some(cdcCompactSql)),
    QueryDef("ext_ri_audit", riAuditQ, Some(riAuditSql)),
    QueryDef("ext_simpsons_flag", simpsonsFlagQ, Some(simpsonsFlagSql)),
    QueryDef("ext_quantile_normalize", quantileNormalizeQ,
      Some(quantileNormalizeSql)),
    QueryDef("ext_pii_luhn", piiLuhn, Some(piiLuhnSql)),
    QueryDef("ev38_iso_week", isoWeek, Some(isoWeekSql)),
    QueryDef("w9_running_distinct", runningDistinct, Some(runningDistinctSql)),
    QueryDef("ext_digit_uniformity", digitUniformity, Some(digitUniformitySql)),
    QueryDef("ext_merkle_audit", merkleAudit, Some(merkleAuditSql)),
    QueryDef("ext_fd_discovery", fdDiscovery, Some(fdDiscoverySql)),
    QueryDef("ev37_pattern_match", patternMatch, Some(patternMatchSql)),
    QueryDef("ext_auc_rank", aucRank, Some(aucRankSql)),
    QueryDef("ext_gini", giniQ, Some(giniSql)),
    QueryDef("ext_spearman", spearmanQ, Some(spearmanSql)),
    QueryDef("ext_kendall_tau", kendallTauQ, Some(kendallTauSql)),
    QueryDef("ext_chi_square", chiSquareQ, Some(chiSquareSql)),
    QueryDef("ext_t_closeness", tClosenessQ, Some(tClosenessSql)),
    QueryDef("ext_weighted_median", weightedMedianQ, Some(weightedMedianSql)),
    QueryDef("ev36_mann_kendall", mannKendallQ, Some(mannKendallSql)),
    QueryDef("ev51_theil_sen", theilSenQ, Some(theilSenSql)),
    QueryDef("ext_pass_at_k", passAtKQ, Some(passAtKSql)))
}
