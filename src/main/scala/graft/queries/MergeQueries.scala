package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, QueryGroup, Tables}
import graft.ops.Upsert

/** Sink-side merge semantics S10–S12 (SURVEY.md §2.1) through the
  * [[graft.ops.Upsert]] operator: Mongo `$set` / `$setOnInsert` bulk
  * upserts and delete_many, as set-wise relational rewrites.
  */
object MergeQueries extends QueryGroup {

  import Tables.load

  private def target(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "customer")
      .select($"c_custkey", $"c_name", $"c_acctbal", $"c_mktsegment")

  /** Updates batch derived deterministically from orders: big spenders get
    * a refreshed balance + VIP segment; top-3 spenders are re-keyed to
    * non-existent ids → inserts. */
  // round(x, 2) diverges between engines on exact .xx5 ties (Spark
  // rounds the shortest-decimal rendering, DuckDB the binary double) —
  // invisible at the gate SFs, surfaced by the 10× ScaleGen sweep
  // (one tied sum flipped both a value AND the top-3 insert selection).
  // The fixture now does half-up rounding IN INTEGER CENTS, the
  // TpchQueries money pattern.
  private def updates(spark: SparkSession, dir: String): DataFrame = {
    val spend = load(spark, dir, "orders")
      .groupBy($"o_custkey")
      .agg(sum(expr("CAST(floor(o_totalprice * 100.0D + 0.5D) AS BIGINT)"))
        .as("_cents"))
      .withColumn("_bal_c", expr("(_cents + 500) div 1000"))
      .where($"_bal_c" > 40000L)
      .select($"o_custkey".as("c_custkey"),
        ($"_bal_c".cast("double") / 100.0).as("c_acctbal"),
        lit("VIP").as("c_mktsegment"))
    val inserts = spend.orderBy(desc("c_acctbal"), $"c_custkey").limit(3)
      .withColumn("c_custkey", $"c_custkey" + 100000)
    spend.unionByName(inserts)
  }

  private val updatesSql =
    """cents AS (
      |  SELECT o_custkey AS c_custkey,
      |         sum(floor(o_totalprice * 100.0::DOUBLE + 0.5::DOUBLE)::BIGINT)
      |           AS cents
      |  FROM orders GROUP BY o_custkey),
      |spend AS (
      |  SELECT c_custkey,
      |         (((cents + 500) // 1000)::BIGINT)::DOUBLE / 100.0::DOUBLE
      |           AS c_acctbal,
      |         'VIP' AS c_mktsegment
      |  FROM cents WHERE ((cents + 500) // 1000) > 40000),
      |ins AS (
      |  SELECT c_custkey + 100000 AS c_custkey, c_acctbal, c_mktsegment
      |  FROM spend ORDER BY c_acctbal DESC, c_custkey LIMIT 3),
      |upd AS (SELECT * FROM spend UNION ALL SELECT * FROM ins),
      |tgt AS (SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer)""".stripMargin

  /** S10a — `$set` merge (update_metadata.py:71-77): update wins. */
  def mergeSet(spark: SparkSession, dir: String): DataFrame =
    Upsert.merge(target(spark, dir), updates(spark, dir), Seq("c_custkey"))
      .orderBy($"c_custkey")

  private val mergeSetSql =
    s"""WITH $updatesSql
       |SELECT coalesce(t.c_custkey, u.c_custkey) AS c_custkey,
       |       t.c_name AS c_name,
       |       coalesce(u.c_acctbal, t.c_acctbal) AS c_acctbal,
       |       coalesce(u.c_mktsegment, t.c_mktsegment) AS c_mktsegment
       |FROM tgt t FULL JOIN upd u ON t.c_custkey = u.c_custkey
       |ORDER BY c_custkey""".stripMargin

  /** S10b — `$setOnInsert` merge (update_reads.py:46-56): discovery never
    * clobbers existing enrichments; only new keys are filled. */
  def mergeSetOnInsert(spark: SparkSession, dir: String): DataFrame =
    Upsert.merge(target(spark, dir), updates(spark, dir), Seq("c_custkey"),
        Map("c_acctbal" -> Upsert.SetOnInsert,
          "c_mktsegment" -> Upsert.SetOnInsert))
      .orderBy($"c_custkey")

  private val mergeSetOnInsertSql =
    s"""WITH $updatesSql
       |SELECT coalesce(t.c_custkey, u.c_custkey) AS c_custkey,
       |       t.c_name AS c_name,
       |       coalesce(t.c_acctbal, u.c_acctbal) AS c_acctbal,
       |       coalesce(t.c_mktsegment, u.c_mktsegment) AS c_mktsegment
       |FROM tgt t FULL JOIN upd u ON t.c_custkey = u.c_custkey
       |ORDER BY c_custkey""".stripMargin

  /** S12 — delete_many by key set (delete_mongo_file_if_not_in_aws.py:34). */
  def deleteByKey(spark: SparkSession, dir: String): DataFrame = {
    val tgt = target(spark, dir)
    val victims = tgt.where($"c_acctbal" < 0)
    Upsert.delete(tgt, victims, Seq("c_custkey")).orderBy($"c_custkey")
  }

  private val deleteByKeySql =
    """SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
      |WHERE c_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
      |ORDER BY c_custkey""".stripMargin

  /** S11 — append sink (insert_many, update_gsheet.py:24-25): pure union. */
  def appendRows(spark: SparkSession, dir: String): DataFrame = {
    val nation = load(spark, dir, "nation").select($"n_nationkey", $"n_name")
    val extra = spark.createDataFrame(
      Seq((900, "ATLANTIS"), (901, "LEMURIA"))).toDF("n_nationkey", "n_name")
    nation.unionByName(extra).orderBy($"n_nationkey")
  }

  private val appendRowsSql =
    """SELECT n_nationkey, n_name FROM nation
      |UNION ALL SELECT * FROM (VALUES (900, 'ATLANTIS'), (901, 'LEMURIA')) v(n_nationkey, n_name)
      |ORDER BY n_nationkey""".stripMargin

  /** Read-length ingestion (update_readlength_mongo.py:14-30) as a merge:
    * a deterministic reads/lengths pair derived from `documents` —
    * half the files get lengths, plus phantom length rows matching
    * nothing (the reference's "Entry not found" case). */
  private def rlReads(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .select(concat(lit("doc_"), $"doc_id".cast("string"), lit(".fastq.gz")).as("file_name"),
        $"lang", lit(null).cast("long").as("sequence_length"))

  private def rlLengths(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
    docs.where($"doc_id" % 2 === 0)
      .select(concat(lit("doc_"), $"doc_id".cast("string"), lit(".fastq.gz")).as("file_name"),
        $"n_chars".cast("long").as("sequence_length"))
      .unionByName(docs.where($"doc_id" % 7 === 0)
        .select(concat(lit("phantom_"), $"doc_id".cast("string"), lit(".fastq.gz")).as("file_name"),
          $"n_chars".cast("long").as("sequence_length")))
  }

  private val rlSql =
    """r AS (
      |  SELECT 'doc_' || doc_id || '.fastq.gz' AS file_name, lang
      |  FROM documents),
      |l AS (
      |  SELECT 'doc_' || doc_id || '.fastq.gz' AS file_name,
      |         n_chars::BIGINT AS sequence_length
      |  FROM documents WHERE doc_id % 2 = 0
      |  UNION ALL
      |  SELECT 'phantom_' || doc_id || '.fastq.gz', n_chars::BIGINT
      |  FROM documents WHERE doc_id % 7 = 0)""".stripMargin

  /** RL1 — $set sequence_length into reads on file_name. */
  def readlengthMerge(spark: SparkSession, dir: String): DataFrame =
    graft.ops.ReadLengths.updateReads(rlReads(spark, dir), rlLengths(spark, dir))
      ._1.select($"file_name", $"lang", $"sequence_length")
      .orderBy($"file_name")

  private val readlengthMergeSql =
    s"""WITH $rlSql
       |SELECT r.file_name, r.lang, l.sequence_length
       |FROM r LEFT JOIN l USING (file_name)
       |ORDER BY file_name""".stripMargin

  /** RL2 — the matched/missing ledger (the reference's log lines). */
  def readlengthLedger(spark: SparkSession, dir: String): DataFrame =
    graft.ops.ReadLengths.updateReads(rlReads(spark, dir), rlLengths(spark, dir))
      ._2.orderBy($"file_name")

  private val readlengthLedgerSql =
    s"""WITH $rlSql
       |SELECT l.file_name,
       |       CASE WHEN r.file_name IS NOT NULL THEN 'matched' ELSE 'missing' END AS status
       |FROM l LEFT JOIN r USING (file_name)
       |ORDER BY file_name""".stripMargin

  /** S15 — SCD2 history-keeping merge ([[graft.ops.Scd2]]): a change
    * batch against a current customer snapshot, where a value change
    * closes the old row and opens a new current one. The batch
    * exercises all four outcomes — real change (`%6==0`), unchanged
    * re-delivery (`%3==0` but not `%6`), brand-new key, untouched key.
    * The oracle replays the merge with an INDEPENDENT three-join
    * formulation (closed/kept/opened CTEs vs the engine's single full
    * join + outcome explode). */
  def scd2Merge(spark: SparkSession, dir: String): DataFrame = {
    val customer = load(spark, dir, "customer")
    val t0 = lit("2024-01-01 00:00:00").cast("timestamp")
    val t1 = lit("2024-06-01 00:00:00").cast("timestamp")
    val history = customer
      .select($"c_custkey", $"c_mktsegment", round($"c_acctbal", 2).as("acctbal"))
      .withColumn("valid_from", t0)
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .withColumn("is_current", lit(true))
    val changes = customer.where($"c_custkey" % 3 === 0)
      .select($"c_custkey",
        when($"c_custkey" % 6 === 0, lit("REASSIGNED"))
          .otherwise($"c_mktsegment").as("c_mktsegment"),
        when($"c_custkey" % 6 === 0, round($"c_acctbal" + 100, 2))
          .otherwise(round($"c_acctbal", 2)).as("acctbal"))
      .unionByName(customer.where($"c_custkey" % 1000 === 1)
        .select(($"c_custkey" + 9000000).as("c_custkey"),
          lit("NEWSEG").as("c_mktsegment"), lit(0.0).as("acctbal")))
    graft.ops.Scd2.merge(history, changes, Seq("c_custkey"),
        Seq("c_mktsegment", "acctbal"), t1)
      .orderBy($"c_custkey", $"valid_from")
  }

  /** Shared CTE chain producing the merged SCD2 history as `merged` —
    * the merge and as-of oracles replay the ONE outcome derivation. */
  private val scd2MergedCte =
    """WITH hist AS (
      |  SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS acctbal,
      |         TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
      |         NULL::TIMESTAMP AS valid_to, true AS is_current
      |  FROM customer),
      |ch AS (
      |  SELECT c_custkey,
      |         CASE WHEN c_custkey % 6 = 0 THEN 'REASSIGNED'
      |              ELSE c_mktsegment END AS c_mktsegment,
      |         CASE WHEN c_custkey % 6 = 0 THEN round(c_acctbal + 100, 2)
      |              ELSE round(c_acctbal, 2) END AS acctbal
      |  FROM customer WHERE c_custkey % 3 = 0
      |  UNION ALL
      |  SELECT c_custkey + 9000000, 'NEWSEG', 0.0
      |  FROM customer WHERE c_custkey % 1000 = 1),
      |closed AS (
      |  SELECT h.c_custkey, h.c_mktsegment, h.acctbal, h.valid_from,
      |         TIMESTAMP '2024-06-01 00:00:00' AS valid_to, false AS is_current
      |  FROM hist h JOIN ch c USING (c_custkey)
      |  WHERE h.c_mktsegment IS DISTINCT FROM c.c_mktsegment
      |     OR h.acctbal IS DISTINCT FROM c.acctbal),
      |kept AS (
      |  SELECT h.* FROM hist h LEFT JOIN ch c USING (c_custkey)
      |  WHERE c.c_custkey IS NULL
      |     OR (h.c_mktsegment IS NOT DISTINCT FROM c.c_mktsegment
      |         AND h.acctbal IS NOT DISTINCT FROM c.acctbal)),
      |opened AS (
      |  SELECT c.c_custkey, c.c_mktsegment, c.acctbal,
      |         TIMESTAMP '2024-06-01 00:00:00' AS valid_from,
      |         NULL::TIMESTAMP AS valid_to, true AS is_current
      |  FROM ch c LEFT JOIN hist h USING (c_custkey)
      |  WHERE h.c_custkey IS NULL
      |     OR h.c_mktsegment IS DISTINCT FROM c.c_mktsegment
      |     OR h.acctbal IS DISTINCT FROM c.acctbal),
      |merged AS (
      |  SELECT * FROM closed UNION ALL SELECT * FROM kept
      |  UNION ALL SELECT * FROM opened)""".stripMargin

  private val scd2MergeSql =
    s"""$scd2MergedCte
       |SELECT * FROM merged ORDER BY c_custkey, valid_from""".stripMargin

  /** As-of reconstruction over the merged SCD2 history: the slice
    * valid at a timestamp — one row per key, the pre-change version at
    * 2024-03-01 and the post-change one at 2024-07-01, labeled. */
  def scd2AsOf(spark: SparkSession, dir: String): DataFrame = {
    import graft.ext.ScopedPersist
    val merged = scd2Merge(spark, dir).persistScoped // sliced twice
    def slice(ts: String) =
      graft.ops.Scd2.asOf(merged, lit(ts).cast("timestamp"))
        .withColumn("as_of", lit(ts))
    slice("2024-03-01 00:00:00")
      .unionByName(slice("2024-07-01 00:00:00"))
      .orderBy($"as_of", $"c_custkey", $"valid_from")
  }

  private val scd2AsOfSql = {
    def slice(ts: String) =
      s"""SELECT *, '$ts' AS as_of FROM merged
         |WHERE valid_from <= TIMESTAMP '$ts'
         |  AND (valid_to IS NULL OR valid_to > TIMESTAMP '$ts')""".stripMargin
    s"""$scd2MergedCte
       |${slice("2024-03-01 00:00:00")}
       |UNION ALL
       |${slice("2024-07-01 00:00:00")}
       |ORDER BY as_of, c_custkey, valid_from""".stripMargin
  }

  /** S19 — CDC apply: events as a change stream over user profiles
    * ('error' = account tombstone, everything else upserts the value);
    * output is the LATEST surviving state per user. The Spark side is
    * one map-side-combined max(struct) aggregate; the oracle uses the
    * INDEPENDENT window formulation. */
  def cdcApply(spark: SparkSession, dir: String): DataFrame = {
    val changes = Tables.load(spark, dir, "events")
      .select($"user_id",
        expr("unix_micros(ts)").as("us"), $"event_id",
        when($"event_type" === "error", "delete").otherwise("upsert").as("op"),
        floor($"value" * 10000.0).cast("long").as("v_q4"),
        $"event_type".as("last_type"))
    graft.ops.Cdc.applyChanges(changes, Seq("user_id"),
        Seq("us", "event_id"), "op", Seq("v_q4", "last_type"))
      .orderBy($"user_id")
  }

  private val cdcApplySql =
    """WITH ch AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id,
      |         CASE WHEN event_type = 'error' THEN 'delete'
      |              ELSE 'upsert' END AS op,
      |         floor(value * 10000.0::DOUBLE)::BIGINT AS v_q4,
      |         event_type AS last_type
      |  FROM events),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id
      |           ORDER BY us DESC, event_id DESC) AS rn,
      |         count(*) OVER (PARTITION BY user_id) AS n_changes
      |  FROM ch)
      |SELECT user_id, v_q4, last_type, n_changes::BIGINT AS n_changes
      |FROM r WHERE rn = 1 AND op != 'delete'
      |ORDER BY user_id""".stripMargin

  /** S24 — golden-record survivorship ([[graft.ops.Survivorship]]):
    * events as per-field profile patches (field = event_type, ~1/3 of
    * patches deliberately carry NO value via the k%3 gate), resolved to
    * the latest NON-NULL value per (user, field) — the per-column
    * independent-winner semantics next to s19's whole-row CDC winner.
    * One map-side-combined max(struct) aggregate; the oracle is the
    * independent window formulation over the non-null subset. */
  def goldenRecord(spark: SparkSession, dir: String): DataFrame = {
    val ev = load(spark, dir, "events").select(
      $"user_id", $"event_type".as("field"), $"ts", $"event_id",
      when(get_json_object($"props", "$.k").cast("long") % 3 =!= 0,
        floor($"value" * 10000.0).cast("long")).as("v_q4"))
    graft.ops.Survivorship.goldenRecord(ev, Seq("user_id"), "field",
        "v_q4", Seq("ts", "event_id"))
      .orderBy($"user_id", $"field")
  }

  private val goldenRecordSql =
    """WITH u AS (
      |  SELECT user_id, event_type AS field, CAST(ts AS TIMESTAMP) AS ts,
      |         event_id,
      |         CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 3 != 0
      |              THEN floor(value * 10000.0::DOUBLE)::BIGINT END AS v_q4
      |  FROM events),
      |w AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id, field
      |           ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM u WHERE v_q4 IS NOT NULL)
      |SELECT user_id, field, ts, event_id, v_q4 FROM w WHERE rn = 1
      |ORDER BY user_id, field""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("s24_golden_record", goldenRecord, Some(goldenRecordSql)),
    QueryDef("s19_cdc_apply", cdcApply, Some(cdcApplySql)),
    QueryDef("s15_scd2_merge", scd2Merge, Some(scd2MergeSql)),
    QueryDef("s16_scd2_asof", scd2AsOf, Some(scd2AsOfSql)),
    QueryDef("s10a_merge_set", mergeSet, Some(mergeSetSql)),
    QueryDef("s10b_merge_setoninsert", mergeSetOnInsert, Some(mergeSetOnInsertSql)),
    QueryDef("s11_append_rows", appendRows, Some(appendRowsSql)),
    QueryDef("s12_delete_by_key", deleteByKey, Some(deleteByKeySql)),
    QueryDef("rl1_readlength_merge", readlengthMerge, Some(readlengthMergeSql)),
    QueryDef("rl2_readlength_ledger", readlengthLedger, Some(readlengthLedgerSql)))
}
