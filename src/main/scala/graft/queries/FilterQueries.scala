package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, QueryGroup, Tables}

/** Scan / projection / filter operators (SURVEY.md §2.1 S3/S5, §2.2 P1–P11).
  *
  * All predicates here are declarative so Catalyst pushes them into the
  * parquet scan (`PushedFilters`) and prunes columns (`ReadSchema`) — at
  * 100 TB these filters run at the source, not after a full read.
  */
object FilterQueries extends QueryGroup {

  import Tables.load

  /** S5 — scan + filter + projection (Mongo find(query, projection) shape,
    * create_sheets.py:73). Filter and projection both reach the scan. */
  def scanFilterProject(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "lineitem")
      .where($"l_shipdate" >= lit("1997-01-01").cast("timestamp"))
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_shipdate")
      .orderBy($"l_orderkey", $"l_linenumber")

  private val scanFilterProjectSql =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
      |FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** S3 — small lookup-table scan (species→project CSV, parse.py:111-121). */
  def lookupScan(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "region").select($"r_regionkey", $"r_name")
      .orderBy($"r_regionkey")

  private val lookupScanSql =
    "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"

  /** P1 — column whitelist projection with schema intersection
    * (df.columns.intersection, parse.py:191-209): unknown whitelist
    * entries are silently dropped. */
  def columnWhitelist(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "customer")
    val whitelist = Seq("c_custkey", "c_name", "c_mktsegment",
      "nonexistent_col", "another_missing")
    val kept = whitelist.filter(df.columns.contains)
    df.select(kept.map(col): _*).orderBy($"c_custkey")
  }

  private val columnWhitelistSql =
    "SELECT c_custkey, c_name, c_mktsegment FROM customer ORDER BY c_custkey"

  /** P2 — drop + rename (parse.py:168-190 shape). */
  def renameDrop(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "customer")
      .drop("c_acctbal")
      .withColumnRenamed("c_custkey", "cust_id")
      .withColumnRenamed("c_mktsegment", "segment")
      .drop("c_nationkey")
      .orderBy($"cust_id")

  private val renameDropSql =
    """SELECT c_custkey AS cust_id, c_name, c_mktsegment AS segment
      |FROM customer ORDER BY cust_id""".stripMargin

  /** P4 — null filter (df[col.notna()] shape): customers with no orders
    * surface a null from the left join, then filter. */
  def nullFilter(spark: SparkSession, dir: String): DataFrame = {
    val customer = load(spark, dir, "customer")
    val custKeys = load(spark, dir, "orders")
      .where($"o_totalprice" > 150000)
      .select($"o_custkey").distinct()
    customer.join(custKeys, customer("c_custkey") === custKeys("o_custkey"), "left")
      .where($"o_custkey".isNull)
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  private val nullFilterSql =
    """SELECT c.c_custkey, c.c_name
      |FROM customer c
      |LEFT JOIN (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 150000) o
      |  ON c.c_custkey = o.o_custkey
      |WHERE o.o_custkey IS NULL ORDER BY c.c_custkey""".stripMargin

  /** P5 — row dedup (drop_duplicates, create_sheets.py:113). */
  def dropDup(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "lineitem")
      .select($"l_returnflag", $"l_linestatus")
      .dropDuplicates()
      .orderBy($"l_returnflag", $"l_linestatus")

  private val dropDupSql =
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** P7 — regex predicate + regex replace (update_reads_by_lane.py:191,
    * parse.py:250-254). */
  def regexFilter(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "part")
      .where($"p_type".rlike("^ECONOMY"))
      .select($"p_partkey",
        regexp_replace($"p_name", " ", "_").as("name_norm"),
        $"p_type")
      .orderBy($"p_partkey")

  private val regexFilterSql =
    """SELECT p_partkey, regexp_replace(p_name, ' ', '_', 'g') AS name_norm, p_type
      |FROM part WHERE regexp_matches(p_type, '^ECONOMY')
      |ORDER BY p_partkey""".stripMargin

  /** P8 — suffix + membership predicates (.gz filter update_reads.py:147,
    * $in filters). */
  def membership(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "part")
      .where($"p_type".endsWith("DARD") && $"p_size".isin(5, 10, 15))
      .select($"p_partkey", $"p_type", $"p_size")
      .orderBy($"p_partkey")

  private val membershipSql =
    """SELECT p_partkey, p_type, p_size FROM part
      |WHERE p_type LIKE '%DARD' AND p_size IN (5, 10, 15)
      |ORDER BY p_partkey""".stripMargin

  /** P9 — incremental anti-filter vs a processed ledger
    * (update_metadata.py:24-44): only new keys survive. */
  def antiLedger(spark: SparkSession, dir: String): DataFrame = {
    val orders = load(spark, dir, "orders")
    // "ledger" = orders already seen: the finished ones
    val ledger = orders.where($"o_orderstatus" === "F").select($"o_orderkey")
    orders.join(ledger, Seq("o_orderkey"), "left_anti")
      .select($"o_orderkey", $"o_orderstatus")
      .orderBy($"o_orderkey")
  }

  private val antiLedgerSql =
    """SELECT o_orderkey, o_orderstatus FROM orders
      |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
      |ORDER BY o_orderkey""".stripMargin

  /** P10 — existence probe as a set-wise semi join (find_one branch,
    * update_srr_accession.py:45-93). */
  def semiProbe(spark: SparkSession, dir: String): DataFrame = {
    val orders = load(spark, dir, "orders")
    val rich = load(spark, dir, "customer")
      .where($"c_acctbal" > 9000).select($"c_custkey")
    orders.join(rich, orders("o_custkey") === rich("c_custkey"), "left_semi")
      .select($"o_orderkey", $"o_custkey")
      .orderBy($"o_orderkey")
  }

  private val semiProbeSql =
    """SELECT o_orderkey, o_custkey FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
      |ORDER BY o_orderkey""".stripMargin

  /** P11 — array-length predicate (len(files) >= n,
    * check_files_field_count.py:34) over tokenized documents. */
  def arrayLen(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .select($"doc_id", size(split($"text", " ")).as("n_tokens"))
      .where($"n_tokens" >= 40)
      .orderBy($"doc_id")

  private val arrayLenSql =
    """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
      |FROM documents WHERE len(string_split(text, ' ')) >= 40
      |ORDER BY doc_id""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("s5_scan_filter_project", scanFilterProject, Some(scanFilterProjectSql)),
    QueryDef("s3_lookup_scan", lookupScan, Some(lookupScanSql)),
    QueryDef("p1_column_whitelist", columnWhitelist, Some(columnWhitelistSql)),
    QueryDef("p2_rename_drop", renameDrop, Some(renameDropSql)),
    QueryDef("p4_null_filter", nullFilter, Some(nullFilterSql)),
    QueryDef("p5_dropdup", dropDup, Some(dropDupSql)),
    QueryDef("p7_regex_filter", regexFilter, Some(regexFilterSql)),
    QueryDef("p8_membership", membership, Some(membershipSql)),
    QueryDef("p9_anti_ledger", antiLedger, Some(antiLedgerSql)),
    QueryDef("p10_semi_probe", semiProbe, Some(semiProbeSql)),
    QueryDef("p11_array_len", arrayLen, Some(arrayLenSql)))
}
