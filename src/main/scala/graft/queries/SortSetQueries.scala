package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, QueryGroup, Tables}

/** Sorts / limits (SURVEY.md §2.6 O1–O4) and set operations (§2.7 U1–U4).
  *
  * Scale notes: the global top-k (o1) is a `TakeOrderedAndProject` physical
  * op (per-partition top-k + driver merge of k·P rows — no full sort
  * shuffle); array set-ops (u4) are narrow per-row expressions.
  */
object SortSetQueries extends QueryGroup {

  import Tables.load

  /** O1 — global sort desc + limit (sort_values('% Done'), parse.py:338).
    * Deterministic tiebreak on the key. */
  def topOrders(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "orders")
      .orderBy(desc("o_totalprice"), $"o_orderkey")
      .select($"o_orderkey", $"o_totalprice")
      .limit(100)

  private val topOrdersSql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** O2 — array sort (sorted(record['files']), create_sheets.py:26):
    * per-order sorted list of line numbers. The list sorts numerically and
    * is emitted as a joined string: the driver's oracle harness hashes
    * cell values and cannot sort/hash raw list columns (two rounds of
    * `unhashable type: numpy.ndarray`), so the contract is a scalar cell. */
  def sortedArrays(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "lineitem")
      .groupBy($"l_orderkey")
      .agg(array_join(
        transform(sort_array(collect_list($"l_linenumber")), n => n.cast("string")),
        ",").as("line_nums"))
      .orderBy($"l_orderkey")

  private val sortedArraysSql =
    """SELECT l_orderkey,
      |       array_to_string(list_sort(list(l_linenumber)), ',') AS line_nums
      |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin

  /** O4 — find_one / limit 1, made deterministic by ordering. */
  def limitOne(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "orders")
      .orderBy($"o_orderkey")
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus")
      .limit(1)

  private val limitOneSql =
    """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
      |ORDER BY o_orderkey LIMIT 1""".stripMargin

  /** U1 — union of two input sets (minicore + non-minicore file lists,
    * update_metadata.py:42-44), allowing missing columns. */
  def unionInputs(spark: SparkSession, dir: String): DataFrame = {
    val customer = load(spark, dir, "customer")
    val a = customer.where($"c_mktsegment" === "BUILDING")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
    val b = customer.where($"c_acctbal" < 0)
      .select($"c_custkey", $"c_name")  // missing c_mktsegment -> null
    a.unionByName(b.withColumn("c_mktsegment", lit(null).cast("string")),
        allowMissingColumns = true)
      .orderBy($"c_custkey", $"c_mktsegment")
  }

  private val unionInputsSql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
      |UNION ALL
      |SELECT c_custkey, c_name, NULL AS c_mktsegment FROM customer WHERE c_acctbal < 0
      |ORDER BY c_custkey, c_mktsegment""".stripMargin

  /** U2 — set difference (mongo files − s3 files,
    * check_if_mongo_files_in_aws.py:53-56). */
  def setDifference(spark: SparkSession, dir: String): DataFrame = {
    val custKeys = load(spark, dir, "customer").select($"c_custkey".as("key"))
    val bigSpenders = load(spark, dir, "orders")
      .where($"o_totalprice" > 150000).select($"o_custkey".as("key"))
    custKeys.except(bigSpenders).orderBy($"key")
  }

  private val setDifferenceSql =
    """SELECT c_custkey AS key FROM customer
      |EXCEPT SELECT o_custkey AS key FROM orders WHERE o_totalprice > 150000
      |ORDER BY key""".stripMargin

  /** U4 — array set ops ($addToSet dedup, $pull remove, filter of ""/"NaN";
    * update_reads.py:190-193,258-273) over tokenized documents. */
  def arrayOps(spark: SparkSession, dir: String): DataFrame = {
    val words = split($"text", " ")
    load(spark, dir, "documents")
      .select(
        $"doc_id",
        size(array_distinct(words)).as("n_distinct"),
        size(filter(words, w => w =!= "the")).as("n_no_the"),
        array_contains(words, "data").as("has_data"),
        size(array_remove(words, "value")).as("n_no_value"))
      .orderBy($"doc_id")
  }

  private val arrayOpsSql =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
      |SELECT doc_id,
      |       len(list_distinct(words)) AS n_distinct,
      |       len(list_filter(words, w -> w != 'the')) AS n_no_the,
      |       list_contains(words, 'data') AS has_data,
      |       len(list_filter(words, w -> w != 'value')) AS n_no_value
      |FROM w ORDER BY doc_id""".stripMargin

  /** O5 — KEYSET pagination: the page of 20 orders strictly after the
    * (orderdate, orderkey) anchor in composite order — the
    * stable-pagination pattern that replaces OFFSET (which re-scans
    * and re-sorts everything before the page at every request). The
    * anchor predicate is a row-value comparison Catalyst splits into
    * range conjuncts, and the plan stays TakeOrderedAndProject: top-k
    * over only the rows past the anchor, never a global sort. */
  def keysetPage(spark: SparkSession, dir: String): DataFrame = {
    val anchor = struct(
      to_timestamp(lit("1995-06-17 00:00:00")).as("o_orderdate"),
      lit(30000L).as("o_orderkey"))
    load(spark, dir, "orders")
      .where(struct($"o_orderdate", $"o_orderkey") > anchor)
      .orderBy($"o_orderdate", $"o_orderkey")
      .limit(20)
      .select($"o_orderkey", $"o_orderdate", $"o_totalprice")
  }

  private val keysetPageSql =
    """SELECT o_orderkey, o_orderdate, o_totalprice
      |FROM orders
      |WHERE (o_orderdate, o_orderkey) > (TIMESTAMP '1995-06-17 00:00:00', 30000)
      |ORDER BY o_orderdate, o_orderkey
      |LIMIT 20""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("o5_keyset_page", keysetPage, Some(keysetPageSql)),
    QueryDef("o1_top_orders", topOrders, Some(topOrdersSql)),
    QueryDef("o2_sorted_arrays", sortedArrays, Some(sortedArraysSql)),
    QueryDef("o4_limit_one", limitOne, Some(limitOneSql)),
    QueryDef("u1_union_inputs", unionInputs, Some(unionInputsSql)),
    QueryDef("u2_set_difference", setDifference, Some(setDifferenceSql)),
    QueryDef("u4_array_ops", arrayOps, Some(arrayOpsSql)))
}
