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

  override def defs: Seq[QueryDef] = Seq(
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
