package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, QueryGroup}
import graft.ops.{Linkage, Pairing}

/** Oracle-checked queries for the linkage crown jewel (J3) and pairing
  * (J6) over inline reference-shaped fixtures — the DuckDB oracle
  * re-implements the tier cascade independently, so the hash match is a
  * true cross-engine proof of the semantics. */
object LinkageQueries extends QueryGroup {

  private def fixtureSamples(spark: SparkSession): DataFrame =
    spark.createDataFrame(Seq(
      ("s1", "CC131_SelS", "YES"),
      ("s2", "AB_1", "YES"),
      ("s3", "CD-2", "YES"),
      ("s4", "GH_4-x", "YES"),
      ("s5", "GATED_5", "NO"),
      ("s6", "S6_1", "YES"),
      ("s7", "ZZ_9", "YES"),
      ("s8", "MM_8,NN_8", "YES")))
      .toDF("sample_name", "minicore_seq_id", "minicore_sequenced")
      .withColumn("files", array().cast("array<string>"))

  private val fixtureSamplesSql =
    """samples(sample_name, minicore_seq_id, minicore_sequenced) AS (VALUES
      |  ('s1', 'CC131_SelS', 'YES'), ('s2', 'AB_1', 'YES'),
      |  ('s3', 'CD-2', 'YES'), ('s4', 'GH_4-x', 'YES'),
      |  ('s5', 'GATED_5', 'NO'), ('s6', 'S6_1', 'YES'),
      |  ('s7', 'ZZ_9', 'YES'), ('s8', 'MM_8,NN_8', 'YES'))""".stripMargin

  private def fixtureReads(spark: SparkSession): DataFrame =
    spark.createDataFrame(Seq(
      ("CC131_SelS_S1_L001_R1_001.fastq.gz", 100L),
      ("CC131_SelS_S1_L001_R2_001.fastq.gz", 110L),
      ("CC131_SelS_S1_L002_R1_001.fastq.gz", 120L),
      ("CC131_SelS_S1_L002_R2_001.fastq.gz", 130L),
      ("AB-1_R1.fastq.gz", 200L), ("AB-1_R2.fastq.gz", 210L),
      ("CD_2_R1.fastq.gz", 300L), ("CD_2_R2.fastq.gz", 310L),
      ("GH_4x_R1.fastq.gz", 400L),
      ("GATED_5_R1.fastq.gz", 500L),
      ("S6_1_R1.fastq", 600L),
      ("NN_8_R1.fastq.gz", 800L),
      ("ORPHAN_X_R1.fastq.gz", 999L)))
      .toDF("file_name", "filesize")
      .withColumn("mdate", lit("2023-01-01 00:00:00").cast("timestamp"))

  private val fixtureReadsSql =
    """reads(file_name, filesize) AS (VALUES
      |  ('CC131_SelS_S1_L001_R1_001.fastq.gz', 100), ('CC131_SelS_S1_L001_R2_001.fastq.gz', 110),
      |  ('CC131_SelS_S1_L002_R1_001.fastq.gz', 120), ('CC131_SelS_S1_L002_R2_001.fastq.gz', 130),
      |  ('AB-1_R1.fastq.gz', 200), ('AB-1_R2.fastq.gz', 210),
      |  ('CD_2_R1.fastq.gz', 300), ('CD_2_R2.fastq.gz', 310),
      |  ('GH_4x_R1.fastq.gz', 400), ('GATED_5_R1.fastq.gz', 500),
      |  ('S6_1_R1.fastq', 600), ('NN_8_R1.fastq.gz', 800),
      |  ('ORPHAN_X_R1.fastq.gz', 999))""".stripMargin

  /** J3 — the full tiered linkage on the fixture; the oracle implements
    * the tier cascade independently in SQL. */
  def linkageTiered(spark: SparkSession, dir: String): DataFrame =
    Linkage.linkScalable(fixtureSamples(spark), fixtureReads(spark))
      .select($"sample_name", $"file_name", $"tier")
      .orderBy($"sample_name", $"file_name")

  private val linkageTieredSql =
    s"""WITH $fixtureSamplesSql,
       |$fixtureReadsSql,
       |gated AS (
       |  SELECT sample_name, string_split(minicore_seq_id, ',')[1] AS id
       |  FROM samples
       |  WHERE upper(minicore_sequenced) = 'YES'
       |    AND minicore_seq_id IS NOT NULL AND lower(minicore_seq_id) != 'nan'),
       |probes AS (
       |  SELECT sample_name, 1 AS tier, id AS key, false AS bare FROM gated
       |  UNION ALL
       |  SELECT sample_name, 2, replace(id, '_', '-'), false FROM gated WHERE contains(id, '_')
       |  UNION ALL
       |  SELECT sample_name, 3, replace(id, '-', ''), false FROM gated WHERE contains(id, '_')
       |  UNION ALL
       |  SELECT sample_name, 2, replace(id, '-', '_'), true FROM gated
       |  WHERE NOT contains(id, '_') AND contains(id, '-')),
       |matches AS (
       |  SELECT p.sample_name, p.tier, r.file_name
       |  FROM probes p JOIN reads r
       |    ON contains(r.file_name, p.key || '_')
       |    OR contains(r.file_name, p.key || '-')
       |    OR contains(r.file_name, p.key || '.')
       |    OR (p.bare AND contains(r.file_name, p.key))),
       |best AS (
       |  SELECT *, min(tier) OVER (PARTITION BY sample_name) AS best_tier
       |  FROM matches)
       |SELECT DISTINCT sample_name, file_name, tier
       |FROM best WHERE tier = best_tier AND file_name LIKE '%.gz'
       |ORDER BY sample_name, file_name""".stripMargin

  /** J6 — positional pairing over an inline fixture with oracle. */
  def pairingPositional(spark: SparkSession, dir: String): DataFrame = {
    val samples = spark.createDataFrame(Seq(
      ("p1", Seq("b_R2.fq.gz", "a_R1.fq.gz"), "Genus species"),
      ("p2", Seq("d", "c", "b", "a"), "Genus species"),
      ("podd", Seq("x", "y", "z"), "Genus species")))
      .toDF("sample_name", "files", "organism")
    Pairing.pairPositional(samples, organismCol = "organism")
      .select($"sample_name", $"pair_id", $"filename", $"filename2",
        $"library_ID", $"title")
      .orderBy($"sample_name", $"pair_id")
  }

  private val pairingPositionalSql =
    """WITH samples(sample_name, files, organism) AS (VALUES
      |  ('p1', ['b_R2.fq.gz', 'a_R1.fq.gz'], 'Genus species'),
      |  ('p2', ['d', 'c', 'b', 'a'], 'Genus species'),
      |  ('podd', ['x', 'y', 'z'], 'Genus species')),
      |even AS (
      |  SELECT sample_name, list_sort(files) AS sf, organism FROM samples
      |  WHERE len(files) % 2 = 0),
      |pos AS (
      |  SELECT sample_name, organism, unnest(sf) AS f,
      |         generate_subscripts(sf, 1) - 1 AS p
      |  FROM even)
      |SELECT sample_name, p // 2 AS pair_id,
      |       min(f) AS filename, max(f) AS filename2,
      |       string_split(min(f), '_R1')[1] AS library_ID,
      |       'Whole genome sequencing of ' || organism AS title
      |FROM pos GROUP BY sample_name, organism, p // 2
      |ORDER BY sample_name, pair_id""".stripMargin

  // Fellegi–Sunter priors for the customer self-linkage demo; ONE
  // definition feeds both the Spark call and the oracle literals
  private val fsComparators = Seq(
    Linkage.FsComparator("bal_k", 0.90, 0.10),
    Linkage.FsComparator("bal_h", 0.85, 0.01),
    Linkage.FsComparator("key_mod", 0.80, 0.01))
  private val fsUpper = 5000000L
  private val fsLower = 0L

  /** j34_linkage_fs — probabilistic record linkage (Fellegi & Sunter
    * 1969, [[Linkage.fellegiSunterSelf]]): customers blocked on
    * (nation, segment), three integer-weighted comparators
    * (thousand-band balance, hundred-band balance, key-mod pseudo
    * phone), q6 log-likelihood score, three-way match/possible/
    * non-match classification. The readout aggregates the whole scored
    * pair space per verdict, so the hash gate pins every weight and
    * every pair's classification. */
  private def fsCustomers(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.load(spark, dir, "customer")
      .select(col("c_custkey").as("cid"),
        col("c_nationkey").cast("long").as("nat"),
        col("c_mktsegment").as("seg"),
        expr("CAST(floor(c_acctbal / 1000.0) AS BIGINT)").as("bal_k"),
        expr("CAST(floor(c_acctbal / 100.0) AS BIGINT)").as("bal_h"),
        (col("c_custkey") % 97).as("key_mod"))

  def linkageFs(spark: SparkSession, dir: String): DataFrame = {
    val cust = fsCustomers(spark, dir)
    Linkage.fellegiSunterSelf(cust, "cid", Seq("nat", "seg"),
        fsComparators, fsUpper, fsLower)
      .groupBy(col("verdict"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("n_agree")).as("sum_agree"),
        min(col("score_q6")).as("score_min"),
        max(col("score_q6")).as("score_max"),
        sum(col("score_q6")).as("score_sum"))
      .orderBy(col("verdict"))
  }

  private val linkageFsSql = {
    val cs = fsComparators.map(c =>
      (c.field, c.wAgreeQ6, c.wDisagreeQ6))
    val scoreExpr = cs.map { case (f, wa, wd) =>
      s"""CASE WHEN a.$f IS NOT NULL AND b.$f IS NOT NULL AND a.$f = b.$f
         |     THEN $wa ELSE $wd END""".stripMargin
    }.mkString("(", " + ", ")")
    val agreeExpr = cs.map { case (f, _, _) =>
      s"""CASE WHEN a.$f IS NOT NULL AND b.$f IS NOT NULL AND a.$f = b.$f
         |     THEN 1 ELSE 0 END""".stripMargin
    }.mkString("(", " + ", ")")
    s"""WITH c AS (
       |  SELECT c_custkey AS cid, c_nationkey::BIGINT AS nat,
       |         c_mktsegment AS seg,
       |         floor(c_acctbal / 1000.0)::BIGINT AS bal_k,
       |         floor(c_acctbal / 100.0)::BIGINT AS bal_h,
       |         (c_custkey % 97)::BIGINT AS key_mod
       |  FROM customer),
       |scored AS (
       |  SELECT $scoreExpr::BIGINT AS score_q6,
       |         $agreeExpr::BIGINT AS n_agree
       |  FROM c a JOIN c b ON a.nat = b.nat AND a.seg = b.seg
       |                    AND a.cid < b.cid)
       |SELECT CASE WHEN score_q6 >= $fsUpper THEN 'match'
       |            WHEN score_q6 <= $fsLower THEN 'non_match'
       |            ELSE 'possible' END AS verdict,
       |       count(*)::BIGINT AS n_pairs,
       |       sum(n_agree)::BIGINT AS sum_agree,
       |       min(score_q6)::BIGINT AS score_min,
       |       max(score_q6)::BIGINT AS score_max,
       |       sum(score_q6)::BIGINT AS score_sum
       |FROM scored GROUP BY 1 ORDER BY verdict""".stripMargin
  }

  /** j35_er_resolve — the COMPLETE entity-resolution pipeline composed
    * from shipped operators: block → Fellegi–Sunter score → classify →
    * transitive closure ([[graft.ext.Dedup.resolveComponents]]) →
    * per-entity golden rollup (members, canonical id = min, best
    * balance band). Matching is transitive by construction here — the
    * production ER shape where pairwise links imply one entity. The
    * oracle re-derives the closure with a recursive min-label CTE,
    * fully independent of the Spark pointer-doubling loop. */
  def erResolve(spark: SparkSession, dir: String): DataFrame = {
    val cust = fsCustomers(spark, dir)
    val matches = Linkage.fellegiSunterSelf(cust, "cid", Seq("nat", "seg"),
        fsComparators, fsUpper, fsLower)
      .where(col("verdict") === "match")
      .select(col("id_a"), col("id_b"))
    val comps = graft.ext.Dedup.resolveComponents(
      cust.select(col("cid")), matches, idCol = "cid")
    comps.join(cust, Seq("cid"))
      .groupBy(col("component_id"))
      .agg(count(lit(1)).as("n_members"),
        min(col("cid")).as("canonical_id"),
        max(col("bal_h")).as("best_bal_h"))
      .where(col("n_members") >= 2)
      .orderBy(col("component_id"))
  }

  private val erResolveSql = {
    val cs = fsComparators.map(c => (c.field, c.wAgreeQ6, c.wDisagreeQ6))
    val scoreExpr = cs.map { case (f, wa, wd) =>
      s"""CASE WHEN a.$f IS NOT NULL AND b.$f IS NOT NULL AND a.$f = b.$f
         |     THEN $wa ELSE $wd END""".stripMargin
    }.mkString("(", " + ", ")")
    s"""WITH RECURSIVE c AS MATERIALIZED (
       |  SELECT c_custkey AS cid, c_nationkey::BIGINT AS nat,
       |         c_mktsegment AS seg,
       |         floor(c_acctbal / 1000.0)::BIGINT AS bal_k,
       |         floor(c_acctbal / 100.0)::BIGINT AS bal_h,
       |         (c_custkey % 97)::BIGINT AS key_mod
       |  FROM customer),
       |m AS MATERIALIZED (
       |  SELECT a.cid AS id_a, b.cid AS id_b
       |  FROM c a JOIN c b ON a.nat = b.nat AND a.seg = b.seg
       |                    AND a.cid < b.cid
       |  WHERE $scoreExpr >= $fsUpper),
       |edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM m
       |  UNION ALL SELECT id_b, id_a FROM m),
       |comp(id, comp) AS (
       |  SELECT cid, cid FROM c
       |  UNION
       |  SELECT e.dst, k.comp FROM edges e JOIN comp k ON e.src = k.id),
       |lab AS (SELECT id, min(comp) AS component_id FROM comp GROUP BY id)
       |SELECT l.component_id, count(*)::BIGINT AS n_members,
       |       min(c.cid)::BIGINT AS canonical_id,
       |       max(c.bal_h)::BIGINT AS best_bal_h
       |FROM lab l JOIN c ON c.cid = l.id
       |GROUP BY 1 HAVING count(*) >= 2
       |ORDER BY component_id""".stripMargin
  }

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("j3b_linkage_tiered", linkageTiered, Some(linkageTieredSql)),
    QueryDef("j34_linkage_fs", linkageFs, Some(linkageFsSql)),
    QueryDef("j35_er_resolve", erResolve, Some(erResolveSql)),
    QueryDef("j5_pairing_positional", pairingPositional, Some(pairingPositionalSql)))
}
