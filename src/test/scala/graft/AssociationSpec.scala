package graft

import graft.ext.Association

class AssociationSpec extends SparkSpec {

  test("assocRules: hand-computed support/confidence/lift, in-basket dups count once") {
    import spark.implicits._
    // baskets: 1:{x,y,z} 2:{x,y} 3:{x} — with a duplicate (1, x) row
    val items = Seq(
      (1L, "x"), (1L, "x"), (1L, "y"), (1L, "z"),
      (2L, "x"), (2L, "y"),
      (3L, "x")
    ).toDF("basket", "item")
    val out = Association.assocRules(items, "basket", "item",
        minPairSupport = 1L)
      .collect().map(r => (r.getAs[String]("a"), r.getAs[String]("b")) ->
        ((r.getAs[Long]("c_ab"), r.getAs[Long]("c_a"), r.getAs[Long]("c_b"),
          r.getAs[Long]("conf_ab_bp"), r.getAs[Long]("conf_ba_bp"),
          r.getAs[Long]("lift_bp")))).toMap
    assert(out.size === 3)
    // c_x=3 c_y=2 c_z=1, N=3
    // (x,y): c_ab=2; conf x→y = 10000*2/3 = 6666; y→x = 10000
    // lift = 10000*2*3/(3*2) = 10000
    assert(out(("x", "y")) === ((2L, 3L, 2L, 6666L, 10000L, 10000L)))
    // (x,z): c_ab=1; conf x→z = 3333; z→x = 10000; lift = 10000*1*3/(3*1)
    assert(out(("x", "z")) === ((1L, 3L, 1L, 3333L, 10000L, 10000L)))
    // (y,z): c_ab=1; conf y→z = 5000; z→y = 10000; lift = 10000*3/(2*1) = 15000
    assert(out(("y", "z")) === ((1L, 2L, 1L, 5000L, 10000L, 15000L)))
  }

  test("assocRules: min-support prunes pairs before the metric joins") {
    import spark.implicits._
    val items = Seq(
      (1L, "x"), (1L, "y"), (1L, "z"),
      (2L, "x"), (2L, "y"),
      (3L, "x")
    ).toDF("basket", "item")
    val out = Association.assocRules(items, "basket", "item",
        minPairSupport = 2L)
      .collect()
    assert(out.length === 1) // only (x, y) has support 2
    assert(out.head.getAs[String]("a") === "x")
    assert(out.head.getAs[String]("b") === "y")
  }

  test("assocRules: one basket-keyed shuffle; metric sides broadcast") {
    import spark.implicits._
    val items = (1L to 50L).flatMap(b =>
      Seq((b, "p"), (b, if (b % 2 == 0) "q" else "r")))
      .toDF("basket", "item")
    val df = Association.assocRules(items, "basket", "item")
    df.count() // AQE finalizes strategies
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p) // singles ride broadcasts
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p) // never a pairwise fact join
    spark.catalog.clearCache()
  }
}
