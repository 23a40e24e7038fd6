package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryDef, QueryGroup, Tables}

/** Join operators J1–J15 (SURVEY.md §2.3) over the driver test tables.
  *
  * Scale notes per join are inline; the common rules: dimensions are
  * `broadcast()`ed (no shuffle), fact-fact joins shuffle once on the key,
  * the substring-linkage join (j3) broadcasts the tiny side so the BNLJ
  * never materializes a cross product of two big inputs, and top-k
  * selections are windows (no self-join).
  */
object JoinQueries extends QueryGroup {

  import Tables.load

  /** J1 — two-tier fallback lookup (species→project then genus→project,
    * parse.py:108-142): exact tier wins, else coarse tier, else constant;
    * plus the tier-1-hit flag (expected_species). Both tiers broadcast. */
  def twoTierLookup(spark: SparkSession, dir: String): DataFrame = {
    val customer = load(spark, dir, "customer")
    val tier1 = load(spark, dir, "nation").where($"n_nationkey" < 15)
      .select($"n_nationkey".as("t1_key"), $"n_name".as("t1_name"))
    val tier2 = load(spark, dir, "region")
      .select($"r_regionkey".as("t2_key"), $"r_name".as("t2_name"))
    customer
      .join(broadcast(tier1), $"c_nationkey" === $"t1_key", "left")
      .join(broadcast(tier2), pmod($"c_nationkey", lit(5)) === $"t2_key", "left")
      .select($"c_custkey",
        coalesce($"t1_name", $"t2_name", lit("Unknown project-id")).as("resolved"),
        $"t1_name".isNotNull.cast("int").as("expected"))
      .orderBy($"c_custkey")
  }

  private val twoTierLookupSql =
    """SELECT c.c_custkey,
      |       coalesce(t1.n_name, t2.r_name, 'Unknown project-id') AS resolved,
      |       CAST(t1.n_name IS NOT NULL AS INT) AS expected
      |FROM customer c
      |LEFT JOIN (SELECT * FROM nation WHERE n_nationkey < 15) t1
      |  ON c.c_nationkey = t1.n_nationkey
      |LEFT JOIN region t2 ON c.c_nationkey % 5 = t2.r_regionkey
      |ORDER BY c.c_custkey""".stripMargin

  /** J2 — broadcast dimension lookup with default (ref-accession lookup,
    * parse.py:177-179): left join + coalesce to sentinel. */
  def dimLookup(spark: SparkSession, dir: String): DataFrame = {
    val li = load(spark, dir, "lineitem").where($"l_quantity" >= 45)
    val part = load(spark, dir, "part")
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"), "left")
      .select($"l_orderkey", $"l_linenumber",
        coalesce($"p_brand", lit("UNKNOWN")).as("brand"),
        $"p_retailprice".as("retail"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  private val dimLookupSql =
    """SELECT l.l_orderkey, l.l_linenumber,
      |       coalesce(p.p_brand, 'UNKNOWN') AS brand,
      |       p.p_retailprice AS retail
      |FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE l.l_quantity >= 45
      |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin

  /** J3 — substring linkage join (the crown jewel, update_reads.py:64-163):
    * probe rows match dimension rows via `contains`. The keyword side is
    * tiny and broadcast, so the physical plan is a BroadcastNestedLoopJoin
    * over a small side — never big×big. (The scalable prefix-equi rewrite
    * lives in ops.Linkage and is golden-tested on fixtures.) */
  def substringLinkage(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
    val kws = spark.createDataFrame(Seq("spark", "shuffle", "window", "stream").map(Tuple1(_))).toDF("kw")
    docs.join(broadcast(kws), $"text".contains($"kw"))
      .select($"doc_id", $"kw")
      .orderBy($"doc_id", $"kw")
  }

  private val substringLinkageSql =
    """SELECT d.doc_id, k.kw
      |FROM documents d
      |JOIN (VALUES ('spark'), ('shuffle'), ('window'), ('stream')) k(kw)
      |  ON d.text LIKE '%' || k.kw || '%'
      |ORDER BY d.doc_id, k.kw""".stripMargin

  /** J4/W2 — conflict resolution by similarity top-1 (fuzz.ratio winner,
    * update_reads.py:166-181): candidates bucketed by key, scored with
    * levenshtein, winner per group via row_number. */
  def conflictTopk(spark: SparkSession, dir: String): DataFrame = {
    val part = load(spark, dir, "part")
    val supp = load(spark, dir, "supplier")
    val cand = part.join(supp, pmod($"p_partkey", lit(100)) === pmod($"s_suppkey", lit(100)))
      .select($"p_partkey", $"s_suppkey", $"s_name",
        levenshtein($"p_name", $"s_name").as("score"))
    val w = Window.partitionBy($"p_partkey").orderBy($"score", $"s_suppkey")
    cand.withColumn("rn", row_number().over(w))
      .where($"rn" === 1)
      .select($"p_partkey", $"s_name".as("best_supplier"), $"score")
      .orderBy($"p_partkey")
  }

  private val conflictTopkSql =
    """WITH cand AS (
      |  SELECT p.p_partkey, s.s_suppkey, s.s_name,
      |         levenshtein(p.p_name, s.s_name) AS score
      |  FROM part p JOIN supplier s ON p.p_partkey % 100 = s.s_suppkey % 100),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY p_partkey
      |                               ORDER BY score, s_suppkey) AS rn
      |  FROM cand)
      |SELECT p_partkey, s_name AS best_supplier, score
      |FROM ranked WHERE rn = 1 ORDER BY p_partkey""".stripMargin

  /** J6 — positional R1/R2 pairing (create_sheets_ultimate.py:394-419):
    * sort the per-group list, pair consecutive elements, even-length
    * groups only. Implemented with sort_array + posexplode (narrow after
    * the one grouping shuffle). */
  def positionalPairing(spark: SparkSession, dir: String): DataFrame = {
    val li = load(spark, dir, "lineitem")
    val grouped = li.groupBy($"l_orderkey")
      .agg(sort_array(collect_list($"l_linenumber")).as("lines"),
        count(lit(1)).as("n"))
      .where(pmod($"n", lit(2)) === 0)
    grouped
      .select($"l_orderkey", posexplode($"lines").as(Seq("pos", "ln")))
      .withColumn("pair_id", floor($"pos" / 2))
      .groupBy($"l_orderkey", $"pair_id")
      .agg(min($"ln").as("fq1"), max($"ln").as("fq2"))
      .orderBy($"l_orderkey", $"pair_id")
  }

  private val positionalPairingSql =
    """WITH even AS (
      |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING count(*) % 2 = 0),
      |pos AS (
      |  SELECT l.l_orderkey, l.l_linenumber,
      |         row_number() OVER (PARTITION BY l.l_orderkey ORDER BY l.l_linenumber) - 1 AS pos
      |  FROM lineitem l JOIN even e ON l.l_orderkey = e.l_orderkey)
      |SELECT l_orderkey, pos // 2 AS pair_id,
      |       min(l_linenumber) AS fq1, max(l_linenumber) AS fq2
      |FROM pos GROUP BY l_orderkey, pos // 2
      |ORDER BY l_orderkey, pair_id""".stripMargin

  /** J9 — enrichment lookup with default (aws size dict .get(f, 0),
    * update_srr_accession.py:30-49). */
  def sizeEnrichment(spark: SparkSession, dir: String): DataFrame = {
    val orders = load(spark, dir, "orders")
    val rich = load(spark, dir, "customer").where($"c_acctbal" > 5000)
    orders.join(rich, orders("o_custkey") === rich("c_custkey"), "left")
      .select($"o_orderkey",
        round(coalesce($"c_acctbal", lit(0.0)), 2).as("acctbal"))
      .orderBy($"o_orderkey")
  }

  private val sizeEnrichmentSql =
    """SELECT o.o_orderkey, round(coalesce(c.c_acctbal, 0), 2) AS acctbal
      |FROM orders o
      |LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000) c
      |  ON o.o_custkey = c.c_custkey
      |ORDER BY o.o_orderkey""".stripMargin

  /** J10 — primary/fallback value with "NA" sentinel
    * (variance_files.py:24-53): coalesce(nullif(primary,'NA'), fallback). */
  def sentinelFallback(spark: SparkSession, dir: String): DataFrame = {
    val customer = load(spark, dir, "customer")
    val nation = load(spark, dir, "nation")
    customer.join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey",
        coalesce(nullif($"c_mktsegment", lit("MACHINERY")), $"n_name").as("resolved"))
      .orderBy($"c_custkey")
  }

  private val sentinelFallbackSql =
    """SELECT c.c_custkey,
      |       coalesce(nullif(c.c_mktsegment, 'MACHINERY'), n.n_name) AS resolved
      |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |ORDER BY c.c_custkey""".stripMargin

  /** J11 — files-array ↔ reads reconciliation (explode + equi join,
    * update_projectID_reads_col.py:23-63): arrays are exploded back to
    * rows, joined to the dimension, re-aggregated. */
  def explodeJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = load(spark, dir, "lineitem")
    val part = load(spark, dir, "part")
    val arrays = li.groupBy($"l_orderkey")
      .agg(collect_list($"l_partkey").as("parts"))
    arrays.select($"l_orderkey", explode($"parts").as("pk"))
      .join(broadcast(part), $"pk" === $"p_partkey")
      .groupBy($"l_orderkey")
      .agg(countDistinct($"p_brand").as("n_brands"))
      .orderBy($"l_orderkey")
  }

  private val explodeJoinSql =
    """SELECT l_orderkey, count(DISTINCT p_brand) AS n_brands
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin

  /** J12 — set reconciliation in both directions
    * (check_if_mongo_files_in_aws.py:47-63). */
  def reconcileBoth(spark: SparkSession, dir: String): DataFrame = {
    val a = load(spark, dir, "orders").where($"o_totalprice" > 150000)
      .select($"o_custkey".as("key")).distinct()
    val b = load(spark, dir, "customer").where($"c_acctbal" > 5000)
      .select($"c_custkey".as("key")).distinct()
    a.except(b).withColumn("side", lit("a_not_b"))
      .unionByName(b.except(a).withColumn("side", lit("b_not_a")))
      .orderBy($"side", $"key")
  }

  private val reconcileBothSql =
    """SELECT key, 'a_not_b' AS side FROM (
      |  SELECT DISTINCT o_custkey AS key FROM orders WHERE o_totalprice > 150000
      |  EXCEPT SELECT DISTINCT c_custkey AS key FROM customer WHERE c_acctbal > 5000)
      |UNION ALL
      |SELECT key, 'b_not_a' AS side FROM (
      |  SELECT DISTINCT c_custkey AS key FROM customer WHERE c_acctbal > 5000
      |  EXCEPT SELECT DISTINCT o_custkey AS key FROM orders WHERE o_totalprice > 150000)
      |ORDER BY side, key""".stripMargin

  /** J13 — per-entity sum over linked detail rows (filesize_sum recompute,
    * update_mongo_FilesizeSum.py:18-48). */
  def groupSumJoin(spark: SparkSession, dir: String): DataFrame = {
    val orders = load(spark, dir, "orders")
    val li = load(spark, dir, "lineitem")
    li.join(orders, li("l_orderkey") === orders("o_orderkey"))
      .groupBy($"o_orderkey", $"o_orderstatus")
      .agg(round(sum($"l_extendedprice"), 2).as("files_sum"),
        count(lit(1)).as("n_files"))
      .orderBy($"o_orderkey")
  }

  private val groupSumJoinSql =
    """SELECT o.o_orderkey, o.o_orderstatus,
      |       round(sum(l.l_extendedprice), 2) AS files_sum,
      |       count(*) AS n_files
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |GROUP BY o.o_orderkey, o.o_orderstatus
      |ORDER BY o.o_orderkey""".stripMargin

  /** J14 — key remap from a mapping table (update_sample_names.py:25-39):
    * new name where mapped, stash the old name. */
  def keyRemap(spark: SparkSession, dir: String): DataFrame = {
    val nation = load(spark, dir, "nation")
    val mapping = spark.createDataFrame(
      Seq(("FRANCE", "FR"), ("GERMANY", "DE"), ("CHINA", "CN")))
      .toDF("old_name", "new_code")
    nation.join(broadcast(mapping), $"n_name" === $"old_name", "left")
      .select($"n_nationkey",
        coalesce($"new_code", $"n_name").as("name"),
        when($"new_code".isNotNull, $"n_name").as("old_name"))
      .orderBy($"n_nationkey")
  }

  private val keyRemapSql =
    """SELECT n.n_nationkey,
      |       coalesce(m.new_code, n.n_name) AS name,
      |       CASE WHEN m.new_code IS NOT NULL THEN n.n_name END AS old_name
      |FROM nation n
      |LEFT JOIN (VALUES ('FRANCE','FR'), ('GERMANY','DE'), ('CHINA','CN')) m(old_name, new_code)
      |  ON n.n_name = m.old_name
      |ORDER BY n.n_nationkey""".stripMargin

  /** J15 — composite-key full-outer merge (coordinate sheet upsert on
    * (sample, project), coordinate_assign_1.py:38-69). */
  def compositeMerge(spark: SparkSession, dir: String): DataFrame = {
    val customer = load(spark, dir, "customer")
    val all = customer.groupBy($"c_nationkey", $"c_mktsegment")
      .agg(count(lit(1)).as("n_all"))
    val rich = customer.where($"c_acctbal" > 5000)
      .groupBy($"c_nationkey", $"c_mktsegment")
      .agg(count(lit(1)).as("n_rich"))
    all.join(rich, Seq("c_nationkey", "c_mktsegment"), "full_outer")
      .select($"c_nationkey", $"c_mktsegment",
        coalesce($"n_all", lit(0)).as("n_all"),
        coalesce($"n_rich", lit(0)).as("n_rich"))
      .orderBy($"c_nationkey", $"c_mktsegment")
  }

  private val compositeMergeSql =
    """WITH base AS (
      |  SELECT c_nationkey, c_mktsegment, count(*) AS n_all
      |  FROM customer GROUP BY 1, 2),
      |rich AS (
      |  SELECT c_nationkey, c_mktsegment, count(*) AS n_rich
      |  FROM customer WHERE c_acctbal > 5000 GROUP BY 1, 2)
      |SELECT c_nationkey, c_mktsegment,
      |       coalesce(n_all, 0) AS n_all, coalesce(n_rich, 0) AS n_rich
      |FROM base FULL JOIN rich USING (c_nationkey, c_mktsegment)
      |ORDER BY c_nationkey, c_mktsegment""".stripMargin

  /** J19 — bloom-prefilter join: lineitem pruned by a Bloom filter of
    * the selective orders subset's keys BEFORE the join shuffle, then
    * exactly joined (false positives removed), so the oracle is the
    * plain inner join. The runtime-filter shape for 100-TB probe sides
    * whose build side is too big to broadcast as rows but tiny as a
    * ~10-bits-per-key bitset. */
  def bloomPrefilterJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = load(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity")
    val urgent = load(spark, dir, "orders")
      .where($"o_orderpriority" === "1-URGENT" && $"o_totalprice" > 150000)
      .select($"o_orderkey".as("l_orderkey"), $"o_orderdate")
    graft.ops.BloomJoin.innerJoin(li, urgent, "l_orderkey")
      .select($"l_orderkey", $"l_linenumber",
        $"o_orderdate".cast("timestamp").as("o_orderdate"), $"l_quantity")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  private val bloomPrefilterJoinSql =
    """SELECT l.l_orderkey, l.l_linenumber,
      |       o.o_orderdate::TIMESTAMP AS o_orderdate, l.l_quantity
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE o.o_orderpriority = '1-URGENT' AND o.o_totalprice > 150000
      |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin

  /** J24 — thresholded fuzzy-match join: mod-blocked candidates, kept
    * when the name edit distance is ≤ 7 (the block key aligns the
    * numeric suffixes; "Customer#"→"Supplier#" costs 6, so the
    * threshold admits ≤ 1 extra digit edit). The [[graft.plans.SimilarityPruning]]
    * rule auto-injects `abs(len−len) <= 7` ahead of the DP kernel —
    * PlanSpec pins the rewrite; here names are equal-length so the
    * gate checks pure correctness. */
  def fuzzyMatchJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = load(spark, dir, "customer").select($"c_custkey", $"c_name")
    val s = load(spark, dir, "supplier").select($"s_suppkey", $"s_name")
    c.join(s, $"c_custkey" % 100 === $"s_suppkey" % 100)
      .where(levenshtein($"c_name", $"s_name") <= 7)
      .select($"c_custkey", $"s_suppkey",
        levenshtein($"c_name", $"s_name").cast("long").as("dist"))
      .orderBy($"c_custkey", $"s_suppkey")
  }

  private val fuzzyMatchJoinSql =
    """SELECT c_custkey, s_suppkey,
      |       levenshtein(c_name, s_name)::BIGINT AS dist
      |FROM customer c JOIN supplier s
      |  ON c.c_custkey % 100 = s.s_suppkey % 100
      |WHERE levenshtein(c_name, s_name) <= 7
      |ORDER BY c_custkey, s_suppkey""".stripMargin

  /** J23 — Jaro–Winkler name-match join: a 1-in-101 probe set of part
    * names matched against the whole part table at jw ≥ 0.9201, scored
    * by the exact-integer codegen kernel ([[graft.functions.JaroWinklerBp]]).
    * The probe side broadcasts (the corpus never shuffles), and
    * [[graft.plans.SimilarityPruning]] auto-injects the length-ratio
    * bound `2000·least(len) ≥ (t−8000)·greatest(len)` ahead of the
    * O(l·window) kernel. The oracle is DuckDB's NATIVE
    * `jaro_winkler_similarity` — an independent implementation of the
    * same published algorithm — so the gate cross-checks the kernel
    * end-to-end. Threshold compare is engine-safe: the nearest
    * achievable similarity sits ≥ 1.4e-2 from 0.9201 at every SF
    * (measured), nine orders above double rounding. */
  def jwMatchJoin(spark: SparkSession, dir: String): DataFrame = {
    val part = load(spark, dir, "part").select($"p_partkey", $"p_name")
    val probes = part.where($"p_partkey" % 101 === 0)
      .select($"p_partkey".as("probe_key"), $"p_name".as("probe_name"))
    part.join(broadcast(probes), $"p_partkey" =!= $"probe_key" &&
        graft.functions.CustomExpressions
          .jaro_winkler_bp($"probe_name", $"p_name") >= 9201)
      .select($"probe_key", $"p_partkey".as("cand_key"),
        $"probe_name", $"p_name".as("cand_name"),
        levenshtein($"probe_name", $"p_name").cast("long").as("lev"))
      .orderBy($"probe_key", $"cand_key")
  }

  private val jwMatchJoinSql =
    """SELECT a.p_partkey AS probe_key, b.p_partkey AS cand_key,
      |       a.p_name AS probe_name, b.p_name AS cand_name,
      |       levenshtein(a.p_name, b.p_name)::BIGINT AS lev
      |FROM part a JOIN part b
      |  ON a.p_partkey % 101 = 0 AND b.p_partkey <> a.p_partkey
      | AND jaro_winkler_similarity(a.p_name, b.p_name) >= 0.9201
      |ORDER BY probe_key, cand_key""".stripMargin

  /** J29 — Damerau–Levenshtein match join: customers blocked by
    * custkey-century, paired at DL ≤ 1 — the transposition-aware rung
    * of the edit-distance family ([[graft.functions.DamerauLevenshtein]],
    * unrestricted Lowrance–Wagner). Both dl and plain lev are emitted,
    * and at DL ≤ 1 the transposed-digit pairs (dl 1, lev 2) are IN the
    * answer set only because transpositions count as one edit — the
    * row set itself distinguishes the kernels; the oracle is DuckDB's
    * independent NATIVE
    * `damerau_levenshtein`. [[graft.plans.SimilarityPruning]] derives
    * the |len−len| ≤ 2 prefilter automatically. */
  def dlMatchJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = load(spark, dir, "customer").select($"c_custkey", $"c_name")
    val a = c.select($"c_custkey".as("custkey_a"), $"c_name".as("name_a"))
    val b = c.select($"c_custkey".as("custkey_b"), $"c_name".as("name_b"))
    a.join(b, expr("custkey_a div 100") === expr("custkey_b div 100") &&
        $"custkey_a" < $"custkey_b")
      .where(graft.functions.CustomExpressions
        .damerau_levenshtein($"name_a", $"name_b") <= 1)
      .select($"custkey_a", $"custkey_b",
        graft.functions.CustomExpressions
          .damerau_levenshtein($"name_a", $"name_b").cast("long").as("dl"),
        levenshtein($"name_a", $"name_b").cast("long").as("lev"))
      .orderBy($"custkey_a", $"custkey_b")
  }

  private val dlMatchJoinSql =
    """SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
      |       damerau_levenshtein(a.c_name, b.c_name)::BIGINT AS dl,
      |       levenshtein(a.c_name, b.c_name)::BIGINT AS lev
      |FROM customer a JOIN customer b
      |  ON a.c_custkey // 100 = b.c_custkey // 100
      | AND a.c_custkey < b.c_custkey
      |WHERE damerau_levenshtein(a.c_name, b.c_name) <= 1
      |ORDER BY custkey_a, custkey_b""".stripMargin

  /** J25 — entity-resolution pipeline end-to-end: sorted-neighborhood
    * blocking (w=8 over the normalized-name order) → Jaro–Winkler
    * verify at 9201 bp (margin to the nearest achievable similarity
    * measured at 0.037 — engine-safe) → connected components →
    * min-key canonical per entity cluster. Composes
    * [[graft.ext.Dedup.sortedNeighborhood]], [[graft.functions.JaroWinklerBp]]
    * and [[graft.ext.Dedup.resolveComponents]]; the oracle replays all
    * three stages relationally (window blocking, DuckDB's native
    * jaro_winkler_similarity, recursive label closure). */
  def erPipeline(spark: SparkSession, dir: String): DataFrame = {
    val parts = load(spark, dir, "part").select($"p_partkey",
      substring(regexp_replace(lower($"p_name"), "[^a-z0-9]", ""), 1, 24).as("snkey"))
    val cand = graft.ext.Dedup.sortedNeighborhood(parts, $"snkey", 8, idCol = "p_partkey")
    val pairs = cand
      .where(graft.functions.CustomExpressions.jaro_winkler_bp($"a_key", $"b_key") >= 9201)
      .select($"a_id".as("id_a"), $"b_id".as("id_b"))
    graft.ext.Dedup.resolveComponents(parts.select($"p_partkey"), pairs, idCol = "p_partkey")
      .orderBy($"p_partkey")
  }

  private val erPipelineSql =
    """WITH RECURSIVE keyed AS (
      |  SELECT p_partkey AS id,
      |         substr(regexp_replace(lower(p_name), '[^a-z0-9]', '', 'g'), 1, 24) AS k
      |  FROM part),
      |ranked AS (SELECT id, k, row_number() OVER (ORDER BY k, id) AS rn FROM keyed),
      |pairs AS MATERIALIZED (
      |  SELECT a.id AS ia, b.id AS ib
      |  FROM ranked a JOIN ranked b ON b.rn - a.rn BETWEEN 1 AND 8
      |  WHERE jaro_winkler_similarity(a.k, b.k) >= 0.9201),
      |edges AS MATERIALIZED (
      |  SELECT ia AS src, ib AS dst FROM pairs
      |  UNION ALL SELECT ib, ia FROM pairs),
      |comp(id, comp) AS (
      |  SELECT id, id FROM keyed
      |  UNION
      |  SELECT e.dst, c.comp FROM edges e JOIN comp c ON e.src = c.id)
      |SELECT id AS p_partkey, min(comp)::BIGINT AS component_id,
      |       (min(comp) = id) AS is_canonical
      |FROM comp GROUP BY id ORDER BY p_partkey""".stripMargin

  /** J28 — salted skew join ([[graft.io.Layout.saltedJoin]]): the
    * events fact joined to the per-user dimension through the (key,
    * salt) spread — semantics identical to the plain inner join (the
    * oracle IS the plain join), so the gate proves the skew machinery
    * is invisible to results. */
  def saltedJoinQ(spark: SparkSession, dir: String): DataFrame = {
    val ev = load(spark, dir, "events")
      .select($"event_id", $"user_id", $"event_type")
    val dim = load(spark, dir, "customer")
      .select($"c_custkey".as("user_id"), $"c_mktsegment")
    graft.io.Layout.saltedJoin(ev, dim, "user_id", nSalts = 8)
      .select($"event_id", $"user_id", $"event_type", $"c_mktsegment")
      .orderBy($"event_id")
  }

  private val saltedJoinSql =
    """SELECT e.event_id, e.user_id, e.event_type, c.c_mktsegment
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |ORDER BY e.event_id""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("j28_salted_join", saltedJoinQ, Some(saltedJoinSql)),
    QueryDef("j29_dl_match_join", dlMatchJoin, Some(dlMatchJoinSql)),
    QueryDef("j25_er_pipeline", erPipeline, Some(erPipelineSql)),
    QueryDef("j23_jw_match_join", jwMatchJoin, Some(jwMatchJoinSql)),
    QueryDef("j24_fuzzy_match_join", fuzzyMatchJoin, Some(fuzzyMatchJoinSql)),
    QueryDef("j19_bloom_join", bloomPrefilterJoin, Some(bloomPrefilterJoinSql)),
    QueryDef("j1_two_tier_lookup", twoTierLookup, Some(twoTierLookupSql)),
    QueryDef("j2_dim_lookup", dimLookup, Some(dimLookupSql)),
    QueryDef("j3_substring_linkage", substringLinkage, Some(substringLinkageSql)),
    QueryDef("j4_conflict_topk", conflictTopk, Some(conflictTopkSql)),
    QueryDef("j6_positional_pairing", positionalPairing, Some(positionalPairingSql)),
    QueryDef("j9_size_enrichment", sizeEnrichment, Some(sizeEnrichmentSql)),
    QueryDef("j10_sentinel_fallback", sentinelFallback, Some(sentinelFallbackSql)),
    QueryDef("j11_explode_join", explodeJoin, Some(explodeJoinSql)),
    QueryDef("j12_reconcile_both", reconcileBoth, Some(reconcileBothSql)),
    QueryDef("j13_group_sum_join", groupSumJoin, Some(groupSumJoinSql)),
    QueryDef("j14_key_remap", keyRemap, Some(keyRemapSql)),
    QueryDef("j15_composite_merge", compositeMerge, Some(compositeMergeSql)))
}
