package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, QueryGroup, Tables}

/** Classic decision-support query shapes (TPC-H Q3/Q6/Q18 adapted to
  * the driver tables' columns) — the standard benchmark surface next to
  * the reference-derived queries, exercising the planner paths a
  * warehouse workload leans on:
  *  - Q3: selective dim filter → broadcast, fact shuffles once, global
  *    top-k as TakeOrderedAndProject;
  *  - Q6: pure scan-aggregate whose predicates ALL push into the
  *    parquet reader (the pushdown litmus);
  *  - Q18: HAVING-style semi-join back onto the fact (the group-filter
  *    then rejoin shape).
  * Oracles are the same ANSI SQL in DuckDB verbatim — these queries ARE
  * SQL, the value of the test is the plan each engine picks. */
object TpchQueries extends QueryGroup {

  import Tables.load
  import graft.ext._
  import org.apache.spark.sql.expressions.Window

  /** Q2 — minimum-cost supplier: for each qualifying part, the
    * EUROPE-region suppliers whose best (minimum) offered price matches
    * the part's region-wide minimum. The classic correlated-subquery
    * decorrelation: the per-part minimum becomes a partitioned window
    * over the already-reduced (part, supplier) offer table, never a
    * re-join of the fact. No partsupp table exists here, so the offer
    * price is the supplier's cheapest lineitem for the part, in exact
    * cents. The oracle keeps the CORRELATED scalar-subquery form so it
    * independently checks the decorrelation. */
  def q2(spark: SparkSession, dir: String): DataFrame = {
    val part = load(spark, dir, "part")
      .where($"p_type" === "LARGE" && $"p_size" <= 10)
      .select($"p_partkey")
    val offers = load(spark, dir, "lineitem")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(min(round($"l_extendedprice" * 100).cast("long")).as("cents"))
    val eu = load(spark, dir, "supplier")
      .join(broadcast(load(spark, dir, "nation")),
        $"s_nationkey" === $"n_nationkey")
      .join(broadcast(load(spark, dir, "region").where($"r_name" === "EUROPE")),
        $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
    val w = Window.partitionBy($"l_partkey")
    offers.join(broadcast(part), $"l_partkey" === $"p_partkey")
      .join(broadcast(eu), $"l_suppkey" === $"s_suppkey")
      .withColumn("min_cents", min($"cents").over(w))
      .where($"cents" === $"min_cents")
      .select(round($"s_acctbal", 2).as("acctbal"), $"s_name", $"n_name",
        $"p_partkey", ($"cents" / 100.0).as("cost"))
      .orderBy($"acctbal".desc, $"n_name", $"s_name", $"p_partkey")
      .limit(100)
  }

  private val q2Sql =
    """WITH offers AS (
      |  SELECT l_partkey, l_suppkey,
      |         min((round(l_extendedprice * 100))::BIGINT) AS cents
      |  FROM lineitem GROUP BY 1, 2),
      |eu AS (
      |  SELECT s_suppkey, s_name, s_acctbal, n_name
      |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE'),
      |cand AS (
      |  SELECT o.l_partkey AS pk, o.l_suppkey AS sk, o.cents
      |  FROM offers o JOIN eu ON o.l_suppkey = eu.s_suppkey
      |  JOIN part ON o.l_partkey = p_partkey
      |  WHERE p_type = 'LARGE' AND p_size <= 10)
      |SELECT round(eu.s_acctbal, 2) AS acctbal, eu.s_name, eu.n_name,
      |       c.pk AS p_partkey, c.cents / 100.0 AS cost
      |FROM cand c JOIN eu ON c.sk = eu.s_suppkey
      |WHERE c.cents = (SELECT min(c2.cents) FROM cand c2 WHERE c2.pk = c.pk)
      |ORDER BY acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin

  /** Q4 — order priority checking: orders placed in one quarter with at
    * least one line shipped more than 30 days after the order date
    * (EXISTS → left-semi join; the extra non-equi date condition rides
    * the join as a residual, the orderkey equi-pair keeps it a hash
    * join). */
  def q4(spark: SparkSession, dir: String): DataFrame = {
    val ord = load(spark, dir, "orders")
      .where($"o_orderdate" >= "1996-07-01" && $"o_orderdate" < "1996-10-01")
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
    val li = load(spark, dir, "lineitem").select($"l_orderkey", $"l_shipdate")
    ord.join(li, $"l_orderkey" === $"o_orderkey" &&
        $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 30 DAYS"), "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  private val q4Sql =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= '1996-07-01' AND o_orderdate < '1996-10-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Q12 — shipping-class priority counts: lines shipped in one year
    * more than 60 days after their order date, split into high/low
    * order priority per return-flag class (no l_shipmode column here —
    * the flag plays the mode's role; the shape is the fact-to-fact
    * equi-join with a residual date predicate and a two-way conditional
    * count). */
  def q12(spark: SparkSession, dir: String): DataFrame = {
    val li = load(spark, dir, "lineitem")
      .where($"l_shipdate" >= "1997-01-01" && $"l_shipdate" < "1998-01-01")
      .select($"l_orderkey", $"l_returnflag", $"l_shipdate")
    val ord = load(spark, dir, "orders")
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .where($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"))
      .groupBy($"l_returnflag")
      .agg(
        sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy($"l_returnflag")
  }

  private val q12Sql =
    """SELECT l_returnflag,
      |       (sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                 THEN 1 ELSE 0 END))::BIGINT AS high_line_count,
      |       (sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                 THEN 0 ELSE 1 END))::BIGINT AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
      |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Q13 — customer order-count distribution: how many customers placed
    * k qualifying orders, INCLUDING the zero bucket (the left-outer
    * join that a HAVING/semi shape would silently drop). Two cascaded
    * aggregates; the second groups on a count so its input is already
    * customer-cardinality. */
  def q13(spark: SparkSession, dir: String): DataFrame = {
    val cust = load(spark, dir, "customer").select($"c_custkey")
    val ord = load(spark, dir, "orders")
      .where($"o_orderpriority" =!= "5-LOW")
      .select($"o_orderkey", $"o_custkey")
    cust.join(ord, $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  private val q13Sql =
    """SELECT c_count, count(*) AS custdist
      |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      |      FROM customer LEFT OUTER JOIN orders
      |        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      |      GROUP BY c_custkey) c_orders
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Q15 — top supplier: the supplier(s) whose quarter revenue equals
    * the global maximum. The scalar-subquery max rides a one-row
    * broadcast cross join; the supplier-cardinality revenue frame is
    * persisted so the fact scans ONCE (the naive plan re-scans it for
    * the max). Exact integer cents end to end. */
  def q15(spark: SparkSession, dir: String): DataFrame = {
    val rev = load(spark, dir, "lineitem")
      .where($"l_shipdate" >= "1996-01-01" && $"l_shipdate" < "1996-04-01")
      .groupBy($"l_suppkey")
      .agg(sum(round($"l_extendedprice" * 100).cast("long") *
        (lit(100L) - round($"l_discount" * 100).cast("long"))).as("total_c"))
      .persistScoped // read twice: scalar max + the filter
    val top = rev.agg(max($"total_c").as("max_c"))
    val supp = load(spark, dir, "supplier").select($"s_suppkey", $"s_name")
    rev.crossJoin(broadcast(top))
      .where($"total_c" === $"max_c")
      .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name",
        (expr("(total_c + 50) div 100") / 100.0).as("total_revenue"))
      .orderBy($"s_suppkey")
  }

  private val q15Sql =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |         (sum((round(l_extendedprice * 100))::BIGINT *
      |              (100 - (round(l_discount * 100))::BIGINT)))::BIGINT AS total_c
      |  FROM lineitem
      |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, ((total_c + 50) // 100) / 100.0 AS total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_c = (SELECT max(total_c) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** Q17 — small-quantity-order revenue: revenue from lines whose
    * quantity is below 20% of the part's average quantity, for one
    * brand. The correlated per-part average decorrelates into ONE
    * shuffle: an unbounded window over the part key computes the count
    * and quantity sum next to every line (no rejoin, no second fact
    * scan), and the 0.2·avg comparison is exact integer cross-mult
    * (5·qty·n < Σqty). The oracle keeps the correlated form. */
  def q17(spark: SparkSession, dir: String): DataFrame = {
    val part = load(spark, dir, "part")
      .where($"p_brand" === "Brand#3").select($"p_partkey")
    val li = load(spark, dir, "lineitem")
      .select($"l_partkey", round($"l_quantity").cast("long").as("qty"),
        round($"l_extendedprice" * 100).cast("long").as("ep_cents"))
    val w = Window.partitionBy($"l_partkey")
    li.join(broadcast(part), $"l_partkey" === $"p_partkey")
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sum_qty", sum($"qty").over(w))
      .where(lit(5L) * $"qty" * $"n" < $"sum_qty")
      .agg(sum($"ep_cents").as("total_cents"))
      .select($"total_cents",
        (expr("total_cents div 7") / 100.0).as("avg_yearly"))
  }

  private val q17Sql =
    """WITH branded AS (
      |  SELECT l_partkey, (round(l_quantity))::BIGINT AS qty,
      |         (round(l_extendedprice * 100))::BIGINT AS ep_cents
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_brand = 'Brand#3')
      |SELECT (sum(ep_cents))::BIGINT AS total_cents,
      |       (((sum(ep_cents))::BIGINT // 7)) / 100.0 AS avg_yearly
      |FROM branded b
      |WHERE 5 * b.qty *
      |        (SELECT count(*) FROM branded b2
      |         WHERE b2.l_partkey = b.l_partkey)
      |      < (SELECT (sum(b2.qty))::BIGINT FROM branded b2
      |         WHERE b2.l_partkey = b.l_partkey)""".stripMargin

  /** Q3 — shipping priority: top-10 unshipped-revenue orders for one
    * market segment. */
  def q3(spark: SparkSession, dir: String): DataFrame = {
    val cust = load(spark, dir, "customer")
      .where($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val ord = load(spark, dir, "orders")
      .where($"o_orderdate" < "1998-01-01")
      .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_orderpriority")
    val li = load(spark, dir, "lineitem")
      .where($"l_shipdate" > "1998-01-01")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
        .as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
      .select($"l_orderkey", $"revenue", $"o_orderdate", $"o_orderpriority")
  }

  private val q3Sql =
    """SELECT l_orderkey,
      |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |       o_orderdate, o_orderpriority
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING'
      |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < '1998-01-01' AND l_shipdate > '1998-01-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** Q6 — forecasting revenue change: one scan, every predicate pushed
    * to the reader, one global aggregate. */
  def q6(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "lineitem")
      .where($"l_shipdate" >= "1995-01-01" && $"l_shipdate" < "1996-01-01" &&
        $"l_discount".between(0.02, 0.06) && $"l_quantity" < 24)
      .agg(round(sum($"l_extendedprice" * $"l_discount"), 2).as("revenue"),
        count(lit(1)).as("n_lines"))

  private val q6Sql =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
      |       count(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01'
      |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""".stripMargin

  /** Q18 — large-volume customers: orders whose total quantity exceeds
    * 300, with the customer attached. The big-side HAVING filter runs
    * BEFORE the joins (group-filter then rejoin). */
  def q18(spark: SparkSession, dir: String): DataFrame = {
    val li = load(spark, dir, "lineitem")
    val big = li.groupBy($"l_orderkey")
      .agg(sum($"l_quantity").as("total_qty"))
      .where($"total_qty" > 300)
    val ord = load(spark, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_totalprice")
    val cust = load(spark, dir, "customer").select($"c_custkey", $"c_name")
    big.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .select($"c_name", $"c_custkey", $"o_orderkey", $"o_orderdate",
        round($"o_totalprice", 2).as("totalprice"),
        round($"total_qty", 2).as("total_qty"))
      .orderBy($"totalprice".desc, $"o_orderkey")
      .limit(100)
  }

  private val q18Sql =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate,
      |       round(o_totalprice, 2) AS totalprice,
      |       round(total_qty, 2) AS total_qty
      |FROM (SELECT l_orderkey, sum(l_quantity) AS total_qty
      |      FROM lineitem GROUP BY l_orderkey
      |      HAVING sum(l_quantity) > 300) t
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** Q1 — pricing summary report: the canonical full-scan grouped
    * aggregate (tiny group count, everything map-side combinable —
    * the partial-aggregation litmus the way Q6 is the pushdown one).
    * Double sums are rounded on BOTH sides (engine summation order
    * differs); averages derive from exact sums ÷ exact counts. */
  def q1(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "lineitem")
      .where($"l_shipdate" <= "1998-09-02")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
          .as("sum_disc_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")
          * (lit(1.0) + $"l_tax")), 2).as("sum_charge"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_extendedprice"), 4).as("avg_price"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 2) AS sum_qty,
      |       round(sum(l_extendedprice), 2) AS sum_base_price,
      |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |       round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2)
      |         AS sum_charge,
      |       round(avg(l_quantity), 4) AS avg_qty,
      |       round(avg(l_extendedprice), 4) AS avg_price,
      |       round(avg(l_discount), 4) AS avg_disc,
      |       count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Q5 — local supplier volume: revenue per nation where customer and
    * supplier share the nation, one region, one order year. The widest
    * join tree in the pack (6 tables): nation/region broadcast, the
    * fact chain shuffles on its natural keys, and the same-nation
    * predicate rides the customer join as a composite key. */
  def q5(spark: SparkSession, dir: String): DataFrame = {
    val li = load(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_suppkey", $"l_extendedprice", $"l_discount")
    val ord = load(spark, dir, "orders")
      .where($"o_orderdate" >= "1996-01-01" && $"o_orderdate" < "1997-01-01")
      .select($"o_orderkey", $"o_custkey")
    val supp = load(spark, dir, "supplier").select($"s_suppkey", $"s_nationkey")
    val cust = load(spark, dir, "customer").select($"c_custkey", $"c_nationkey")
    val nat = load(spark, dir, "nation").select($"n_nationkey", $"n_name", $"n_regionkey")
    val reg = load(spark, dir, "region").where($"r_name" === "ASIA")
      .select($"r_regionkey")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(supp, $"l_suppkey" === $"s_suppkey")
      .join(cust, $"o_custkey" === $"c_custkey" &&
        $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
      .withColumn("cents", round($"l_extendedprice" * 100).cast("long") *
        (lit(100L) - round($"l_discount" * 100).cast("long")))
      .groupBy($"n_name")
      // exact integer cents×percent, half-up rounded IN INTEGER math:
      // double summation order differs between engines, and round()
      // of a .xx5 tie diverges too (Spark rounds the shortest decimal
      // rendering, DuckDB the binary value) — so no double touches
      // anything until one final /100.0 of an exact integer
      .agg((expr("(sum(cents) + 50) div 100") / 100.0).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  private val q5Sql =
    """SELECT n_name,
      |       ((sum((round(l_extendedprice * 100))::BIGINT *
      |             (100 - (round(l_discount * 100))::BIGINT)) + 50) // 100)
      |         / 100.0 AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** Q10 — returned item reporting: top-20 customers by revenue lost to
    * returns in one quarter. Group-by-customer over the filtered fact;
    * nation broadcasts, customer joins hash-wise on its key. */
  def q10(spark: SparkSession, dir: String): DataFrame = {
    val li = load(spark, dir, "lineitem")
      .where($"l_returnflag" === "R")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    val ord = load(spark, dir, "orders")
      .where($"o_orderdate" >= "1996-01-01" && $"o_orderdate" < "1996-04-01")
      .select($"o_orderkey", $"o_custkey")
    val cust = load(spark, dir, "customer")
      .select($"c_custkey", $"c_name", $"c_acctbal", $"c_nationkey")
    val nat = load(spark, dir, "nation").select($"n_nationkey", $"n_name")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .withColumn("cents", round($"l_extendedprice" * 100).cast("long") *
        (lit(100L) - round($"l_discount" * 100).cast("long")))
      .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
      .agg((expr("(sum(cents) + 50) div 100") / 100.0).as("revenue"))
      .select($"c_custkey", $"c_name", $"revenue",
        round($"c_acctbal", 2).as("acctbal"), $"n_name")
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  private val q10Sql =
    """SELECT c_custkey, c_name,
      |       ((sum((round(l_extendedprice * 100))::BIGINT *
      |             (100 - (round(l_discount * 100))::BIGINT)) + 50) // 100)
      |         / 100.0 AS revenue,
      |       round(c_acctbal, 2) AS acctbal, n_name
      |FROM customer, orders, lineitem, nation
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate >= '1996-01-01' AND o_orderdate < '1996-04-01'
      |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** Q7 — volume shipping: bilateral trade revenue between two nations
    * by ship year, the two-role nation join (supplier's nation vs
    * customer's nation joined independently). Exact integer cents. */
  def q7(spark: SparkSession, dir: String): DataFrame = {
    val li = load(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_suppkey", year($"l_shipdate").as("l_year"),
        (round($"l_extendedprice" * 100).cast("long") *
          (lit(100L) - round($"l_discount" * 100).cast("long"))).as("cents"))
    val supp = load(spark, dir, "supplier").select($"s_suppkey", $"s_nationkey")
    val n1 = load(spark, dir, "nation")
      .select($"n_nationkey".as("s_nk"), $"n_name".as("supp_nation"))
    val ord = load(spark, dir, "orders").select($"o_orderkey", $"o_custkey")
    val cust = load(spark, dir, "customer").select($"c_custkey", $"c_nationkey")
    val n2 = load(spark, dir, "nation")
      .select($"n_nationkey".as("c_nk"), $"n_name".as("cust_nation"))
    li.join(supp, $"l_suppkey" === $"s_suppkey")
      .join(broadcast(n1), $"s_nationkey" === $"s_nk")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(broadcast(n2), $"c_nationkey" === $"c_nk")
      .where(($"supp_nation" === "NATION_3" && $"cust_nation" === "NATION_7") ||
        ($"supp_nation" === "NATION_7" && $"cust_nation" === "NATION_3"))
      .groupBy($"supp_nation", $"cust_nation", $"l_year")
      .agg((expr("(sum(cents) + 50) div 100") / 100.0).as("revenue"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  private val q7Sql =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |       year(l_shipdate) AS l_year,
      |       ((sum((round(l_extendedprice * 100))::BIGINT *
      |             (100 - (round(l_discount * 100))::BIGINT)) + 50) // 100)
      |         / 100.0 AS revenue
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      |   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** Q8 — market share: the share of one supplier nation in a region's
    * PROMO-part revenue per order year, as an exact basis-point ratio
    * (two float sums' ratio can't hash — cents can). */
  def q8(spark: SparkSession, dir: String): DataFrame = {
    val li = load(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_partkey", $"l_suppkey",
        (round($"l_extendedprice" * 100).cast("long") *
          (lit(100L) - round($"l_discount" * 100).cast("long"))).as("cents"))
    val part = load(spark, dir, "part").where($"p_type" === "PROMO")
      .select($"p_partkey")
    val supp = load(spark, dir, "supplier").select($"s_suppkey", $"s_nationkey")
    val n1 = load(spark, dir, "nation")
      .select($"n_nationkey".as("s_nk"), $"n_name".as("supp_nation"))
    val ord = load(spark, dir, "orders")
      .select($"o_orderkey", $"o_custkey", year($"o_orderdate").as("o_year"))
    val cust = load(spark, dir, "customer").select($"c_custkey", $"c_nationkey")
    val n2 = load(spark, dir, "nation")
      .select($"n_nationkey".as("c_nk"), $"n_regionkey")
    val reg = load(spark, dir, "region").where($"r_name" === "ASIA")
      .select($"r_regionkey")
    li.join(part, $"l_partkey" === $"p_partkey")
      .join(supp, $"l_suppkey" === $"s_suppkey")
      .join(broadcast(n1), $"s_nationkey" === $"s_nk")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(broadcast(n2), $"c_nationkey" === $"c_nk")
      .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
      .groupBy($"o_year")
      .agg(
        sum(when($"supp_nation" === "NATION_5", $"cents").otherwise(0L))
          .as("nat_c"),
        sum($"cents").as("tot_c"))
      .select($"o_year",
        expr("(nat_c + 50) div 100").as("nation_cents"),
        expr("(tot_c + 50) div 100").as("total_cents"),
        expr("(10000 * nat_c) div tot_c").as("share_bp"))
      .orderBy($"o_year")
  }

  private val q8Sql =
    """WITH j AS (
      |  SELECT year(o_orderdate) AS o_year,
      |         (round(l_extendedprice * 100))::BIGINT *
      |         (100 - (round(l_discount * 100))::BIGINT) AS cents,
      |         n1.n_name AS supp_nation
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  JOIN region ON n2.n_regionkey = r_regionkey
      |  WHERE p_type = 'PROMO' AND r_name = 'ASIA'),
      |s AS (
      |  SELECT o_year,
      |         sum(CASE WHEN supp_nation = 'NATION_5' THEN cents ELSE 0 END)
      |           AS nat_c,
      |         sum(cents) AS tot_c
      |  FROM j GROUP BY o_year)
      |SELECT o_year, ((nat_c + 50) // 100)::BIGINT AS nation_cents,
      |       ((tot_c + 50) // 100)::BIGINT AS total_cents,
      |       ((10000 * nat_c) // tot_c)::BIGINT AS share_bp
      |FROM s ORDER BY o_year""".stripMargin

  /** Q14 — promotion effect: share of one month's revenue from PROMO
    * parts, as an exact-integer basis-point ratio (the double ratio of
    * two engine-ordered float sums can't hash; cents can). */
  def q14(spark: SparkSession, dir: String): DataFrame = {
    val li = load(spark, dir, "lineitem")
      .where($"l_shipdate" >= "1996-01-01" && $"l_shipdate" < "1996-02-01")
      .select($"l_partkey",
        (round($"l_extendedprice" * 100).cast("long") *
          (lit(100L) - round($"l_discount" * 100).cast("long"))).as("cents"))
    val part = load(spark, dir, "part").select($"p_partkey", $"p_type")
    li.join(part, $"l_partkey" === $"p_partkey")
      .agg(
        sum(when($"p_type" === "PROMO", $"cents").otherwise(0L)).as("promo_c"),
        sum($"cents").as("total_c"))
      .select(
        expr("(promo_c + 50) div 100").as("promo_cents"),
        expr("(total_c + 50) div 100").as("total_cents"),
        expr("(10000 * promo_c) div total_c").as("promo_bp"))
  }

  private val q14Sql =
    """WITH j AS (
      |  SELECT (round(l_extendedprice * 100))::BIGINT *
      |         (100 - (round(l_discount * 100))::BIGINT) AS cents, p_type
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-02-01'),
      |s AS (SELECT sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END) AS promo_c,
      |             sum(cents) AS total_c FROM j)
      |SELECT ((promo_c + 50) // 100)::BIGINT AS promo_cents,
      |       ((total_c + 50) // 100)::BIGINT AS total_cents,
      |       ((10000 * promo_c) // total_c)::BIGINT AS promo_bp
      |FROM s""".stripMargin

  /** Q19 — discounted revenue under an OR-of-ANDs predicate across the
    * part join (brand × size × quantity bands): the disjunctive
    * join-filter shape planners must keep equi. */
  def q19(spark: SparkSession, dir: String): DataFrame = {
    val li = load(spark, dir, "lineitem")
      .select($"l_partkey", $"l_quantity",
        (round($"l_extendedprice" * 100).cast("long") *
          (lit(100L) - round($"l_discount" * 100).cast("long"))).as("cents"))
    val part = load(spark, dir, "part")
      .select($"p_partkey", $"p_brand", $"p_size")
    li.join(part, $"l_partkey" === $"p_partkey")
      .where(
        ($"p_brand" === "Brand#12" && $"p_size".between(1, 15) &&
          $"l_quantity".between(1, 20)) ||
        ($"p_brand" === "Brand#23" && $"p_size".between(10, 30) &&
          $"l_quantity".between(10, 30)))
      .agg(count(lit(1)).as("n_lines"),
        (expr("(sum(cents) + 50) div 100") / 100.0).as("revenue"))
  }

  private val q19Sql =
    """SELECT count(*) AS n_lines,
      |       ((sum((round(l_extendedprice * 100))::BIGINT *
      |             (100 - (round(l_discount * 100))::BIGINT)) + 50) // 100)
      |         / 100.0 AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
      |       AND l_quantity BETWEEN 10 AND 30)""".stripMargin

  /** Q9 — product-type profit: per supplier nation and ship year, the
    * profit on one part family. No partsupp/supplycost table exists
    * here, so unit cost is the part's retail price; profit is EXACT in
    * cents×percent scale (revenue cents·(100−disc) − qty·retail-cents
    * ·100) — sums can be negative, so NO integer rounding division
    * touches them (floor-vs-truncate diverges between engines on
    * negatives); the readable double is one pure division of the exact
    * integer. Every dimension broadcasts; the fact shuffles once for
    * the group-by. */
  def q9(spark: SparkSession, dir: String): DataFrame = {
    val part = load(spark, dir, "part")
      .where($"p_name".contains("gear"))
      .select($"p_partkey",
        round($"p_retailprice" * 100).cast("long").as("retail_cents"))
    val supp = load(spark, dir, "supplier").select($"s_suppkey", $"s_nationkey")
    val nat = load(spark, dir, "nation").select($"n_nationkey", $"n_name")
    val li = load(spark, dir, "lineitem")
      .select($"l_partkey", $"l_suppkey", year($"l_shipdate").as("o_year"),
        (round($"l_extendedprice" * 100).cast("long") *
          (lit(100L) - round($"l_discount" * 100).cast("long"))).as("rev_c100"),
        round($"l_quantity").cast("long").as("qty"))
    li.join(broadcast(part), $"l_partkey" === $"p_partkey")
      .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
      .withColumn("profit_c100", $"rev_c100" - $"qty" * $"retail_cents" * 100L)
      .groupBy($"n_name", $"o_year")
      .agg(sum($"profit_c100").as("sum_profit_c100"))
      .select($"n_name", $"o_year", $"sum_profit_c100",
        ($"sum_profit_c100" / 10000.0).as("sum_profit"))
      .orderBy($"n_name", $"o_year".desc)
  }

  private val q9Sql =
    """SELECT n_name, year(l_shipdate) AS o_year,
      |       (sum((round(l_extendedprice * 100))::BIGINT *
      |              (100 - (round(l_discount * 100))::BIGINT)
      |            - (round(l_quantity))::BIGINT *
      |              (round(p_retailprice * 100))::BIGINT * 100))::BIGINT
      |         AS sum_profit_c100,
      |       (sum((round(l_extendedprice * 100))::BIGINT *
      |              (100 - (round(l_discount * 100))::BIGINT)
      |            - (round(l_quantity))::BIGINT *
      |              (round(p_retailprice * 100))::BIGINT * 100))::BIGINT
      |         / 10000.0 AS sum_profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%gear%'
      |GROUP BY 1, 2 ORDER BY n_name, o_year DESC""".stripMargin

  /** Q11 — important stock value: parts whose revenue from one nation's
    * suppliers exceeds TWICE the average per-part value (the HAVING-
    * against-a-scalar-subquery shape; the threshold is relative to the
    * average rather than a fixed share of the total so it is
    * scale-free — real Q11 scales its fraction by 1/SF for the same
    * reason). The per-part frame persists so the fact scans once; the
    * scalars ride a one-row broadcast; the test is exact integer
    * cross-multiplication (part_c·n > 2·tot). */
  def q11(spark: SparkSession, dir: String): DataFrame = {
    val supp = load(spark, dir, "supplier")
      .join(broadcast(load(spark, dir, "nation").where($"n_name" === "NATION_1")),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey")
    val li = load(spark, dir, "lineitem")
      .select($"l_partkey", $"l_suppkey",
        (round($"l_extendedprice" * 100).cast("long") *
          (lit(100L) - round($"l_discount" * 100).cast("long"))).as("cents"))
    val byPart = li.join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
      .groupBy($"l_partkey").agg(sum($"cents").as("part_c"))
      .persistScoped // read twice: the scalar totals + the share filter
    val tot = byPart.agg(sum($"part_c").as("tot_c"),
      count(lit(1)).as("n_parts"))
    byPart.crossJoin(broadcast(tot))
      .where($"part_c" * $"n_parts" > lit(2L) * $"tot_c")
      .select($"l_partkey".as("p_partkey"),
        (expr("(part_c + 50) div 100") / 100.0).as("value"))
      .orderBy($"value".desc, $"p_partkey")
  }

  private val q11Sql =
    """WITH v AS (
      |  SELECT l_partkey,
      |         (sum((round(l_extendedprice * 100))::BIGINT *
      |              (100 - (round(l_discount * 100))::BIGINT)))::BIGINT AS part_c
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_name = 'NATION_1' GROUP BY 1)
      |SELECT l_partkey AS p_partkey, ((part_c + 50) // 100) / 100.0 AS value
      |FROM v
      |WHERE part_c * (SELECT count(*) FROM v)
      |      > 2 * (SELECT (sum(part_c))::BIGINT FROM v)
      |ORDER BY value DESC, p_partkey""".stripMargin

  /** Q16 — supplier count by part attributes: distinct suppliers per
    * (brand, type, size) over a NOT-LIKE/IN-list part filter, excluding
    * a supplier denylist (negative balance stands in for the complaints
    * predicate) via a broadcast anti join. The distinct runs BEFORE the
    * count so the final aggregate is a plain count over a deduped
    * frame. */
  def q16(spark: SparkSession, dir: String): DataFrame = {
    val part = load(spark, dir, "part")
      .where($"p_brand" =!= "Brand#1" && !$"p_type".startsWith("PROMO") &&
        $"p_size".isin(1, 5, 10, 15, 20, 25))
      .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
    val badSupp = load(spark, dir, "supplier")
      .where($"s_acctbal" < 0).select($"s_suppkey")
    val li = load(spark, dir, "lineitem").select($"l_partkey", $"l_suppkey")
    li.join(broadcast(part), $"l_partkey" === $"p_partkey")
      .join(broadcast(badSupp), $"l_suppkey" === $"s_suppkey", "left_anti")
      .select($"p_brand", $"p_type", $"p_size", $"l_suppkey").distinct()
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(count(lit(1)).as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
  }

  private val q16Sql =
    """SELECT p_brand, p_type, p_size,
      |       (count(DISTINCT l_suppkey))::BIGINT AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
      |  AND p_size IN (1, 5, 10, 15, 20, 25)
      |  AND l_suppkey NOT IN
      |      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** Q20 — dominant shippers: suppliers who shipped more than half of a
    * part family's yearly quantity (the availqty>half-of-shipped shape
    * without a partsupp table). The per-part total is a partitioned
    * window over the already-reduced (part, supplier) frame — no
    * rejoin, no second fact scan; quantities compare as exact longs. */
  def q20(spark: SparkSession, dir: String): DataFrame = {
    val part = load(spark, dir, "part")
      .where($"p_name".startsWith("red")).select($"p_partkey")
    val li = load(spark, dir, "lineitem")
      .where($"l_shipdate" >= "1996-01-01" && $"l_shipdate" < "1997-01-01")
      .select($"l_partkey", $"l_suppkey",
        round($"l_quantity").cast("long").as("qty"))
      .join(broadcast(part), $"l_partkey" === $"p_partkey")
    val w = Window.partitionBy($"l_partkey")
    val supp = load(spark, dir, "supplier").select($"s_suppkey", $"s_name")
    li.groupBy($"l_partkey", $"l_suppkey")
      .agg(sum($"qty").as("supp_qty"))
      .withColumn("part_qty", sum($"supp_qty").over(w))
      .where(lit(2L) * $"supp_qty" > $"part_qty")
      .groupBy($"l_suppkey")
      .agg(count(lit(1)).as("n_parts_dominated"))
      .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"n_parts_dominated")
      .orderBy($"s_suppkey")
  }

  private val q20Sql =
    """WITH j AS (
      |  SELECT l_partkey, l_suppkey,
      |         (sum((round(l_quantity))::BIGINT))::BIGINT AS supp_qty
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE 'red%'
      |    AND l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
      |  GROUP BY 1, 2),
      |d AS (
      |  SELECT l_suppkey FROM j
      |  WHERE 2 * supp_qty > (SELECT (sum(j2.supp_qty))::BIGINT FROM j j2
      |                        WHERE j2.l_partkey = j.l_partkey))
      |SELECT s_suppkey, s_name, count(*) AS n_parts_dominated
      |FROM d JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY 1, 2 ORDER BY s_suppkey""".stripMargin

  /** Q21 — suppliers who kept orders waiting: late lines (shipped >90
    * days after the order date) on finished multi-supplier orders where
    * this supplier was the ONLY late one. The classic plan is two extra
    * fact joins (EXISTS + NOT EXISTS); this decorrelates into ONE
    * orderkey shuffle — per order, count distinct suppliers, distinct
    * late suppliers, and the late line count; the sole late supplier
    * falls out of max(when(late, suppkey)). The oracle keeps the
    * correlated double-EXISTS form, so it independently checks the
    * rewrite. */
  def q21(spark: SparkSession, dir: String): DataFrame = {
    val ord = load(spark, dir, "orders").where($"o_orderstatus" === "F")
      .select($"o_orderkey", $"o_orderdate")
    val li = load(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
    val perOrder = li.join(ord, $"l_orderkey" === $"o_orderkey")
      .withColumn("late",
        $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS"))
      .groupBy($"o_orderkey")
      .agg(countDistinct($"l_suppkey").as("n_supp"),
        countDistinct(when($"late", $"l_suppkey")).as("n_late_supp"),
        max(when($"late", $"l_suppkey")).as("late_supp"),
        sum(when($"late", 1L).otherwise(0L)).as("n_late_lines"))
    val supp = load(spark, dir, "supplier").select($"s_suppkey", $"s_name")
    perOrder.where($"n_supp" >= 2 && $"n_late_supp" === 1)
      .groupBy($"late_supp")
      .agg(sum($"n_late_lines").as("numwait"))
      .join(broadcast(supp), $"late_supp" === $"s_suppkey")
      .select($"s_name", $"numwait")
      .orderBy($"numwait".desc, $"s_name")
      .limit(20)
  }

  private val q21Sql =
    """SELECT s_name, (count(*))::BIGINT AS numwait
      |FROM lineitem l1
      |JOIN orders ON l1.l_orderkey = o_orderkey
      |JOIN supplier ON l1.l_suppkey = s_suppkey
      |WHERE o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin

  /** Q22 — dormant wealthy customers: per nation group, customers with
    * above-positive-average balances and no recent orders (no phone
    * column — the nation key plays the country code's role; "dormant"
    * = no orders in the trailing window, since every customer here has
    * SOME order). The average decorrelates into a one-row broadcast of
    * exact sums; the balance test is integer cross-multiplication; the
    * no-recent-orders test is an anti join. */
  def q22(spark: SparkSession, dir: String): DataFrame = {
    val sel = load(spark, dir, "customer")
      .where($"c_nationkey".isin(1, 3, 5, 7, 9, 11, 13))
      .select($"c_custkey", $"c_nationkey",
        round($"c_acctbal" * 100).cast("long").as("bal_c"))
      .persistScoped // read twice: the positive-average scalar + the filter
    val avgPos = sel.where($"bal_c" > 0L)
      .agg(sum($"bal_c").as("sum_c"), count(lit(1)).as("n_pos"))
    val recentOrd = load(spark, dir, "orders")
      .where($"o_orderdate" >= "1999-01-01")
      .select($"o_custkey")
    sel.crossJoin(broadcast(avgPos))
      .where($"bal_c" * $"n_pos" > $"sum_c")
      .join(recentOrd, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("numcust"),
        (sum($"bal_c") / 100.0).as("totacctbal"))
      .orderBy($"c_nationkey")
  }

  private val q22Sql =
    """WITH sel AS (
      |  SELECT c_custkey, c_nationkey,
      |         (round(c_acctbal * 100))::BIGINT AS bal_c
      |  FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)),
      |s AS (SELECT (sum(bal_c))::BIGINT AS sum_c, count(*) AS n_pos
      |      FROM sel WHERE bal_c > 0)
      |SELECT c_nationkey, count(*) AS numcust,
      |       (sum(bal_c))::BIGINT / 100.0 AS totacctbal
      |FROM sel, s
      |WHERE bal_c * n_pos > sum_c
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= '1999-01-01')
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("q2_min_cost_supp", q2, Some(q2Sql)),
    QueryDef("q4_order_priority", q4, Some(q4Sql)),
    QueryDef("q12_late_lines", q12, Some(q12Sql)),
    QueryDef("q13_cust_distribution", q13, Some(q13Sql)),
    QueryDef("q15_top_supplier", q15, Some(q15Sql)),
    QueryDef("q17_small_qty_revenue", q17, Some(q17Sql)),
    QueryDef("q9_product_profit", q9, Some(q9Sql)),
    QueryDef("q11_important_value", q11, Some(q11Sql)),
    QueryDef("q16_supplier_cnt", q16, Some(q16Sql)),
    QueryDef("q20_excess_shippers", q20, Some(q20Sql)),
    QueryDef("q21_waiting_suppliers", q21, Some(q21Sql)),
    QueryDef("q22_dormant_customers", q22, Some(q22Sql)),
    QueryDef("q1_pricing_summary", q1, Some(q1Sql)),
    QueryDef("q3_shipping_priority", q3, Some(q3Sql)),
    QueryDef("q5_local_supplier", q5, Some(q5Sql)),
    QueryDef("q6_forecast_revenue", q6, Some(q6Sql)),
    QueryDef("q7_nation_volume", q7, Some(q7Sql)),
    QueryDef("q8_market_share", q8, Some(q8Sql)),
    QueryDef("q10_returned_items", q10, Some(q10Sql)),
    QueryDef("q14_promo_effect", q14, Some(q14Sql)),
    QueryDef("q18_large_orders", q18, Some(q18Sql)),
    QueryDef("q19_brand_bands", q19, Some(q19Sql)))
}
