package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, QueryGroup, Tables}
import graft.ext.{Frequency, Preference, TextStats}

/** Annotation / preference / eval readouts for a training-data
  * pipeline (SURVEY §8, r12 additions): multi-annotator agreement
  * (Fleiss' κ), pairwise-preference strength (Bradley–Terry via
  * Hunter's MM), and candidate-vs-reference n-gram overlap scoring
  * (ROUGE-style) — the three measurement surfaces an RLHF / eval loop
  * reports over labeled and generated data. Each oracle replays the
  * full arithmetic independently in DuckDB (integer basis points where
  * exact, 6-dp-rounded doubles for the MM fixpoint with the iteration
  * count pinned and unrolled as MATERIALIZED CTEs — the repo's
  * mixRaking/msf discipline for multiply-referenced rounds). */
object AnnotationQueries extends QueryGroup {

  private def load(spark: SparkSession, dir: String, t: String) =
    Tables.load(spark, dir, t)

  /** ext_fleiss_kappa — Fleiss' κ over orders-as-items: every order
    * with EXACTLY 4 lineitems is an item rated by a 4-slot panel, the
    * label is l_returnflag (3 categories). The op itself enforces the
    * complete-case panel; the oracle replays cells → complete-case
    * semi-join → margins → sign-before-division κ_bp. */
  def fleissKappaQ(spark: SparkSession, dir: String): DataFrame =
    Frequency.fleissKappa(
      load(spark, dir, "lineitem").select($"l_orderkey", $"l_returnflag"),
      "l_orderkey", "l_returnflag", raters = 4)

  private val fleissKappaSql =
    """WITH cells AS MATERIALIZED (
      |  SELECT l_orderkey AS i, l_returnflag AS j, count(*)::BIGINT AS c
      |  FROM lineitem GROUP BY 1, 2),
      |kept AS MATERIALIZED (
      |  SELECT c.i, c.j, c.c FROM cells c
      |  JOIN (SELECT i FROM cells GROUP BY i HAVING sum(c) = 4) k
      |    ON c.i = k.i),
      |base AS (SELECT count(DISTINCT i)::BIGINT AS n_items,
      |                coalesce(sum(c * c), 0)::BIGINT AS sum_sq FROM kept),
      |s2 AS (SELECT coalesce(sum(cj::HUGEINT * cj), 0)::HUGEINT AS s2
      |       FROM (SELECT j, sum(c)::BIGINT AS cj FROM kept GROUP BY j)),
      |f AS (SELECT n_items, sum_sq, s2, n_items::HUGEINT * 4 AS t
      |      FROM base CROSS JOIN s2)
      |SELECT n_items, 4::BIGINT AS n_raters, sum_sq, s2::BIGINT AS s2_cat,
      |  (CASE WHEN 3 * (t * t - s2) = 0 THEN 0
      |   WHEN t * (sum_sq - t) - 3 * s2 >= 0
      |     THEN (10000 * (t * (sum_sq - t) - 3 * s2)) // (3 * (t * t - s2))
      |   ELSE -((10000 * (3 * s2 - t * (sum_sq - t))) // (3 * (t * t - s2)))
      |   END)::BIGINT AS kappa_bp
      |FROM f""".stripMargin

  /** ext_kripp_alpha — Krippendorff's nominal α over the SAME ratings
    * as ext_fleiss_kappa but with NO complete-case requirement: every
    * order with ≥ 2 lineitems contributes, weighted by its own panel
    * size ([[Frequency.krippendorffAlpha]] — the incomplete-panel
    * generalization; L = lcm(1..31) clears every per-item denominator
    * so α is exact integer basis points). */
  def krippAlphaQ(spark: SparkSession, dir: String): DataFrame =
    Frequency.krippendorffAlpha(
      load(spark, dir, "lineitem").select($"l_orderkey", $"l_returnflag"),
      "l_orderkey", "l_returnflag", maxRaters = 32)

  // lcm(1..31) — MUST match krippendorffAlpha(maxRaters = 32)'s internal
  // constant; computed with the same fold so the oracle can't drift
  private def lcm31: Long = (2 until 32)
    .foldLeft(1L)((a, b) => a / BigInt(a).gcd(BigInt(b)).toLong * b)

  private def krippAlphaSql =
    s"""WITH cells AS MATERIALIZED (
       |  SELECT l_orderkey AS i, l_returnflag AS j, count(*)::BIGINT AS c
       |  FROM lineitem GROUP BY 1, 2),
       |items AS MATERIALIZED (
       |  SELECT i, sum(c)::BIGINT AS m FROM cells GROUP BY 1),
       |kept AS MATERIALIZED (
       |  SELECT c.i, c.j, c.c, it.m FROM cells c JOIN items it ON c.i = it.i
       |  WHERE it.m >= 2),
       |base AS (SELECT count(*)::BIGINT AS n_items,
       |                coalesce(sum(m), 0)::BIGINT AS n_values
       |         FROM items WHERE m >= 2),
       |s AS (SELECT coalesce(sum((c * (m - c))::HUGEINT *
       |               ($lcm31 // (m - 1))), 0)::HUGEINT AS s FROM kept),
       |s2 AS (SELECT coalesce(sum(cj::HUGEINT * cj), 0)::HUGEINT AS s2
       |       FROM (SELECT j, sum(c)::BIGINT AS cj FROM kept GROUP BY j)),
       |f AS (SELECT n_items, n_values, s, s2, n_values::HUGEINT AS n,
       |             $lcm31::HUGEINT *
       |               (n_values::HUGEINT * n_values - s2) AS den
       |      FROM base CROSS JOIN s CROSS JOIN s2)
       |SELECT n_items, n_values,
       |  (CASE WHEN n = 0 THEN 0
       |   ELSE (10000 * s) // ($lcm31::HUGEINT * n) END)::BIGINT AS do_bp,
       |  s2::BIGINT AS s2_cat,
       |  (CASE WHEN den <= 0 THEN 0
       |   ELSE 10000 - (10000 * s * (n - 1)) // den END)::BIGINT AS alpha_bp
       |FROM f""".stripMargin

  /** Shared duel derivation for the preference pair: within each
    * order, nations duel on supplier revenue in EXACT integer cents
    * (double sums would flip near-tie win∕loss between engines);
    * ties produce no game. */
  private def nationOutcomes(spark: SparkSession, dir: String): DataFrame = {
    val rev = load(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_suppkey", $"l_extendedprice")
      .join(broadcast(load(spark, dir, "supplier")
        .select($"s_suppkey", $"s_nationkey")),
        $"l_suppkey" === $"s_suppkey")
      .join(broadcast(load(spark, dir, "nation")
        .select($"n_nationkey", $"n_name")),
        $"s_nationkey" === $"n_nationkey")
      .groupBy($"l_orderkey", $"n_name")
      .agg(sum(round($"l_extendedprice" * 100).cast("long")).as("cents"))
    // Pair generation WITHOUT the rev⋈rev self-join (which recomputed
    // the unpersisted aggregate twice and re-shuffled both copies by
    // l_orderkey): ONE more aggregate collects each order's ≤ 25-entry
    // (nation, cents) list, and the i<j pairs explode in-row — bounded
    // by nations-per-order at every scale, no orderkey shuffle of two
    // aggregate copies. Each unordered pair appears exactly once
    // (list order is irrelevant: i<j enumerates every 2-subset), the
    // winner is cents-determined, ties drop — row-identical to the
    // self-join formulation (guide §2.4/§3.3: remove the shuffle, and
    // never explode BEFORE deciding).
    rev.groupBy($"l_orderkey")
      .agg(collect_list(struct($"n_name", $"cents")).as("ns"))
      .select(explode(expr(
        """flatten(transform(ns, (x, i) ->
          |  transform(slice(ns, i + 2, size(ns) - i - 1), y ->
          |    struct(x.n_name AS na, x.cents AS ca,
          |           y.n_name AS nb, y.cents AS cb))))""".stripMargin))
        .as("p"))
      .where($"p.ca" =!= $"p.cb")
      .select(when($"p.ca" > $"p.cb", $"p.na").otherwise($"p.nb").as("winner"),
        when($"p.ca" > $"p.cb", $"p.nb").otherwise($"p.na").as("loser"))
  }

  /** ext_bradley_terry — nations as players over [[nationOutcomes]]
    * duels. [[Preference.bradleyTerry]] fits 10 MM iterations on the
    * 25-player win matrix; the oracle unrolls the same 10 iterations. */
  def bradleyTerryQ(spark: SparkSession, dir: String): DataFrame =
    Preference.bradleyTerry(nationOutcomes(spark, dir),
        "winner", "loser", iters = 10)
      .withColumnRenamed("player", "n_name")
      .orderBy($"rnk")

  /** ext_condorcet_cycles — transitivity audit of the same duel data:
    * strict majority dominances, comparable triples, Condorcet cycles
    * and the cycle share ([[Preference.condorcetCycles]]). */
  def condorcetQ(spark: SparkSession, dir: String): DataFrame =
    Preference.condorcetCycles(nationOutcomes(spark, dir))

  // shared oracle prefix: duels -> directed win matrix (def, not val —
  // object-init order would interpolate "null" into dependent SQL)
  private def duelSqlPrefix =
    """rev AS MATERIALIZED (
      |  SELECT l_orderkey AS ok, n_name AS nm,
      |         sum(round(l_extendedprice * 100)::BIGINT)::BIGINT AS cents
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  GROUP BY 1, 2),
      |outc AS MATERIALIZED (
      |  SELECT CASE WHEN a.cents > b.cents THEN a.nm ELSE b.nm END AS w,
      |         CASE WHEN a.cents > b.cents THEN b.nm ELSE a.nm END AS l
      |  FROM rev a JOIN rev b ON a.ok = b.ok AND a.nm < b.nm
      |  WHERE a.cents <> b.cents),
      |dw AS MATERIALIZED (
      |  SELECT w AS i, l AS j, count(*)::BIGINT AS wd FROM outc
      |  GROUP BY 1, 2)""".stripMargin

  private def condorcetSql =
    s"""WITH $duelSqlPrefix,
       |dom AS MATERIALIZED (
       |  SELECT d.i AS a, d.j AS b FROM dw d
       |  LEFT JOIN dw r ON r.i = d.j AND r.j = d.i
       |  WHERE d.wd > coalesce(r.wd, 0)),
       |np2 AS (SELECT count(DISTINCT x)::BIGINT AS n_players FROM (
       |          SELECT i AS x FROM dw UNION ALL SELECT j AS x FROM dw)),
       |nd AS (SELECT count(*)::BIGINT AS n_dominances FROM dom),
       |cyc AS (SELECT count(*)::BIGINT AS n_cycles
       |        FROM dom e1
       |        JOIN dom e2 ON e2.a = e1.b
       |        JOIN dom e3 ON e3.a = e2.b AND e3.b = e1.a
       |        WHERE e1.a < e1.b AND e1.a < e2.b),
       |und AS MATERIALIZED (
       |  SELECT least(a, b) AS a, greatest(a, b) AS b FROM dom),
       |cmp AS (SELECT count(*)::BIGINT AS n_comparable_triples
       |        FROM und u1
       |        JOIN und u2 ON u2.a = u1.b
       |        JOIN und u3 ON u3.a = u1.a AND u3.b = u2.b)
       |SELECT n_players, n_dominances, n_comparable_triples, n_cycles,
       |  (CASE WHEN n_comparable_triples = 0 THEN 0
       |   ELSE (10000 * n_cycles) // n_comparable_triples
       |   END)::BIGINT AS cycle_bp
       |FROM np2 CROSS JOIN nd CROSS JOIN cmp CROSS JOIN cyc""".stripMargin

  private def btRound(i: Int): String = {
    val prev = s"p${i - 1}"
    s"""p$i AS MATERIALIZED (
       |  SELECT g.i,
       |    coalesce(w.w, 0)::DOUBLE /
       |      sum(g.n::DOUBLE / (pi.p + pj.p)) AS p
       |  FROM np g
       |  JOIN $prev pi ON g.i = pi.i
       |  JOIN $prev pj ON g.j = pj.i
       |  LEFT JOIN wi w ON g.i = w.i
       |  GROUP BY g.i, w.w)""".stripMargin
  }

  private def bradleyTerrySql =
    s"""WITH $duelSqlPrefix,
       |np AS MATERIALIZED (
       |  SELECT i, j, sum(wd)::BIGINT AS n FROM (
       |    SELECT i, j, wd FROM dw
       |    UNION ALL SELECT j AS i, i AS j, wd FROM dw) u
       |  GROUP BY 1, 2),
       |wi AS MATERIALIZED (SELECT i, sum(wd)::BIGINT AS w FROM dw GROUP BY 1),
       |p0 AS MATERIALIZED (SELECT DISTINCT i, 1.0::DOUBLE AS p FROM np),
       |${(1 to 10).map(btRound).mkString(",\n")},
       |norm AS (SELECT sum(p) AS s FROM p10),
       |fin AS (
       |  SELECT p10.i AS n_name, coalesce(wi.w, 0)::BIGINT AS wins,
       |         g.games, round(p10.p / norm.s, 6) AS strength
       |  FROM p10
       |  LEFT JOIN wi ON p10.i = wi.i
       |  JOIN (SELECT i, sum(n)::BIGINT AS games FROM np GROUP BY 1) g
       |    ON p10.i = g.i
       |  CROSS JOIN norm)
       |SELECT n_name, wins, games, strength,
       |       row_number() OVER (ORDER BY strength DESC, n_name) AS rnk
       |FROM fin ORDER BY rnk""".stripMargin

  /** ext_rouge_pairs — candidate∕reference eval scoring over adjacent
    * document pairs (doc 2k = candidate, doc 2k+1 = reference — a
    * deterministic pairing both engines spell identically):
    * ROUGE-1∕ROUGE-2 clipped precision∕recall∕F1 in integer basis
    * points via [[TextStats.rougeOverlap]]. */
  def rougePairsQ(spark: SparkSession, dir: String): DataFrame = {
    val d = load(spark, dir, "documents").select($"doc_id", $"text")
    val pairs = d.where($"doc_id" % 2 === 0)
      .select($"doc_id".as("pair_id"), $"text".as("cand"))
      .join(d.select(($"doc_id" - 1).as("pair_id"), $"text".as("ref")),
        Seq("pair_id"))
    TextStats.rougeOverlap(pairs).orderBy($"pair_id", $"n")
  }

  private val rougePairsSql =
    """WITH d AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
      |                w -> w <> '') AS t
      |  FROM documents),
      |pairs AS MATERIALIZED (
      |  SELECT c.doc_id AS pid, c.t AS c1, r.t AS r1
      |  FROM d c JOIN d r ON r.doc_id = c.doc_id + 1
      |  WHERE c.doc_id % 2 = 0),
      |big AS MATERIALIZED (
      |  SELECT pid, c1, r1,
      |    list_transform(range(2, len(c1) + 1),
      |      i -> c1[i-1] || ' ' || c1[i]) AS c2,
      |    list_transform(range(2, len(r1) + 1),
      |      i -> r1[i-1] || ' ' || r1[i]) AS r2
      |  FROM pairs),
      |ca AS (SELECT pid, n, g, count(*)::BIGINT AS ca FROM (
      |         SELECT pid, 1 AS n, unnest(c1) AS g FROM big
      |         UNION ALL SELECT pid, 2 AS n, unnest(c2) AS g FROM big)
      |       GROUP BY 1, 2, 3),
      |cb AS (SELECT pid, n, g, count(*)::BIGINT AS cb FROM (
      |         SELECT pid, 1 AS n, unnest(r1) AS g FROM big
      |         UNION ALL SELECT pid, 2 AS n, unnest(r2) AS g FROM big)
      |       GROUP BY 1, 2, 3),
      |ov AS (SELECT pid, n, sum(least(ca, cb))::BIGINT AS overlap
      |       FROM ca JOIN cb USING (pid, n, g) GROUP BY 1, 2),
      |tot AS (SELECT pid, 1 AS n, len(c1)::BIGINT AS cand_ngrams,
      |               len(r1)::BIGINT AS ref_ngrams FROM big
      |        UNION ALL
      |        SELECT pid, 2 AS n, len(c2)::BIGINT, len(r2)::BIGINT FROM big),
      |m AS (
      |  SELECT t.pid AS pair_id, t.n::BIGINT AS n, t.cand_ngrams,
      |    t.ref_ngrams, coalesce(o.overlap, 0)::BIGINT AS overlap,
      |    (CASE WHEN t.cand_ngrams > 0
      |      THEN (10000 * coalesce(o.overlap, 0)) // t.cand_ngrams
      |      ELSE 0 END)::BIGINT AS prec_bp,
      |    (CASE WHEN t.ref_ngrams > 0
      |      THEN (10000 * coalesce(o.overlap, 0)) // t.ref_ngrams
      |      ELSE 0 END)::BIGINT AS rec_bp
      |  FROM tot t LEFT JOIN ov o ON t.pid = o.pid AND t.n = o.n)
      |SELECT pair_id, n, cand_ngrams, ref_ngrams, overlap, prec_bp, rec_bp,
      |  (CASE WHEN prec_bp + rec_bp > 0
      |    THEN (2 * prec_bp * rec_bp) // (prec_bp + rec_bp)
      |    ELSE 0 END)::BIGINT AS f1_bp
      |FROM m ORDER BY pair_id, n""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("ext_fleiss_kappa", fleissKappaQ, Some(fleissKappaSql)),
    QueryDef("ext_kripp_alpha", krippAlphaQ, Some(krippAlphaSql)),
    QueryDef("ext_bradley_terry", bradleyTerryQ, Some(bradleyTerrySql)),
    QueryDef("ext_condorcet_cycles", condorcetQ, Some(condorcetSql)),
    QueryDef("ext_rouge_pairs", rougePairsQ, Some(rougePairsSql)))
}
