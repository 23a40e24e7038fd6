package graft

import org.apache.spark.sql.functions._
import graft.queries.AggQueries

class AggQueriesSpec extends SparkSpec {

  test("a1 project summary: one row per nation, pct_active in [0,1], sorted desc") {
    val df = AggQueries.projectSummary(spark, sfDir).cache()
    val rows = df.collect()
    assert(rows.nonEmpty)
    val pcts = rows.map(_.getAs[Double]("pct_active"))
    assert(pcts.forall(p => p >= 0.0 && p <= 1.0))
    // n_with_orders <= n_customers
    assert(rows.forall(r => r.getAs[Long]("n_with_orders") <= r.getAs[Long]("n_customers")))
    df.unpersist()
  }

  test("a1 top_segment is a real segment (deterministic mode)") {
    val df = AggQueries.projectSummary(spark, sfDir)
    val segs = df.select("top_segment").distinct().collect().map(_.getString(0)).toSet
    val real = Tables.load(spark, sfDir, "customer")
      .select("c_mktsegment").distinct().collect().map(_.getString(0)).toSet
    assert(segs.subsetOf(real))
  }

  test("a2 conditional agg: qty_f <= total_qty, pct in [0,1]") {
    val rows = AggQueries.conditionalAgg(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("qty_f") <= r.getAs[Double]("total_qty"))
      val p = r.getAs[Double]("pct_f")
      assert(p >= 0.0 && p <= 1.0)
    }
  }

  test("a3 proportions sum to ~1 per order") {
    val sums = AggQueries.groupProportion(spark, sfDir)
      .groupBy("l_orderkey").agg(sum("price_share").as("s"))
      .collect().map(_.getAs[Double]("s"))
    assert(sums.forall(s => math.abs(s - 1.0) < 1e-3))
  }

  test("a5 filtered count matches direct count") {
    val n = AggQueries.filteredCount(spark, sfDir).collect()(0).getAs[Long]("n_finished")
    val direct = Tables.load(spark, sfDir, "orders")
      .where(col("o_orderstatus") === "F").count()
    assert(n === direct)
  }

  test("a7 min<=max per user") {
    val rows = AggQueries.minDate(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.getAs[java.sql.Timestamp]("first_seen")
        .after(r.getAs[java.sql.Timestamp]("last_seen")))
    }
  }

  test("a9 histogram counts sum to table size") {
    val total = AggQueries.histogram(spark, sfDir)
      .agg(sum("n")).collect()(0).getLong(0)
    assert(total === Tables.load(spark, sfDir, "events").count())
  }
}
