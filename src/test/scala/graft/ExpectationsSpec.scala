package graft

import graft.ops.Expectations
import org.apache.spark.sql.functions._

/** Expectations goldens: violation counting incl. null predicates,
  * uniqueness surplus math, and the one-scan plan property (adding a
  * rule adds a column, not a pass over the data). */
class ExpectationsSpec extends SparkSpec {

  import spark.implicits._

  test("check: exact violation counts; null predicate results count as violations") {
    val df = Seq[(Long, Option[Double])](
      (1L, Some(5.0)), (2L, Some(50.0)), (3L, Some(-1.0)), (4L, None))
      .toDF("id", "v")
    val out = Expectations.check(df, Seq(
        "v_nonneg" -> ($"v" < 0.0), // null v -> null predicate -> violation
        "v_le_10" -> ($"v" > 10.0),
        "id_not_null" -> $"id".isNull))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out("v_nonneg") === ((4L, 2L, false))) // -1 and the null row
    assert(out("v_le_10") === ((4L, 2L, false))) // 50 and the null row
    assert(out("id_not_null") === ((4L, 0L, true)))
  }

  test("checkUnique: surplus beyond one row per key; empty input passes") {
    val df = Seq((1L, "a"), (1L, "a"), (1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("k1", "k2")
    val r = Expectations.checkUnique(df, Seq("k1", "k2"), "pk").head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)) ===
      (("pk", 5L, 2L, false)))
    val empty = Expectations.checkUnique(df.where(lit(false)), Seq("k1")).head
    assert((empty.getLong(1), empty.getLong(2), empty.getBoolean(3)) ===
      ((0L, 0L, true)))
  }

  test("plan: predicate rules share ONE scan and ONE aggregate") {
    val df = Seq((1L, 2.0), (2L, 3.0)).toDF("id", "v")
    val plan = Expectations.check(df, Seq(
        "a" -> ($"v" < 0.0), "b" -> ($"v" > 10.0), "c" -> $"id".isNull))
      .queryExecution.executedPlan.toString
    // one scan of the input regardless of rule count
    assert(plan.split("LocalTableScan").length - 1 === 1, plan)
    assert(!plan.contains("Join"), plan)
  }
}
