package graft

import graft.ops.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: nulls, ndv, and native-type min/max on a mixed fixture") {
    val df = Seq(
      (Some(3L), Some("b"), Some(2.5)),
      (Some(10L), None, Some(-1.0)),
      (Some(3L), Some("a"), None),
      (None, Some("a"), Some(2.5)))
      .toDF("n", "s", "d")
    val got = Profile.profile(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))).toMap
    assert(got("n") === ((4L, 1L, 2L, "3", "10")))   // numeric order: 3 < 10
    assert(got("s") === ((4L, 1L, 2L, "a", "b")))
    assert(got("d") === ((4L, 1L, 2L, "-1.0", "2.5")))
  }

  test("profile real table: invariants hold for every column") {
    val out = Profile.profile(Tables.load(spark, sfDir, "orders")).collect()
    assert(out.length === Tables.load(spark, sfDir, "orders").columns.length)
    val n = out.head.getLong(1)
    out.foreach { r =>
      assert(r.getLong(1) === n)                      // one shared row count
      assert(r.getLong(2) >= 0 && r.getLong(2) <= n)  // nulls within range
      assert(r.getLong(3) >= 1 && r.getLong(3) <= n)  // ndv within range
      assert(r.getString(4) != null && r.getString(5) != null)
    }
  }

  private def fd(rows: Seq[(java.lang.Long, String, String)],
      rules: Seq[(String, Seq[String], Seq[String])]) = {
    import spark.implicits._
    graft.ops.Profile.fdCheck(rows.toDF("id", "a", "b"), rules)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap
  }

  test("fdCheck: a holding FD, a violated FD, and exact violation counts") {
    // a→b: group x maps to {p, q} (3 rows, violating); y maps to {p} only
    val rows = Seq[(java.lang.Long, String, String)](
      (1L, "x", "p"), (2L, "x", "p"), (3L, "x", "q"), (4L, "y", "p"))
    val out = fd(rows, Seq(
      ("id_key", Seq("id"), Seq("a", "b")),
      ("a_to_b", Seq("a"), Seq("b"))))
    assert(out("id_key") === ((4L, 0L, 0L, true)))
    assert(out("a_to_b") === ((2L, 1L, 3L, false)))
  }

  test("fdCheck: null dependents are ONE value class; null determinants group") {
    // group x maps to {null} twice -> agrees, holds; null det maps to {p, q}
    val rows = Seq[(java.lang.Long, String, String)](
      (1L, "x", null), (2L, "x", null), (3L, null, "p"), (4L, null, "q"))
    val out = fd(rows, Seq(("a_to_b", Seq("a"), Seq("b"))))
    assert(out("a_to_b") === ((2L, 1L, 2L, false)))
  }

  test("fdCheck: empty table holds every rule with zero counters") {
    val out = fd(Seq.empty, Seq(("a_to_b", Seq("a"), Seq("b"))))
    assert(out("a_to_b") === ((0L, 0L, 0L, true)))
  }

  test("fdDiscover: single-scan all-pairs agrees with per-rule fdCheck") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (1 to 300).map { i =>
      (s"k${i % 40}", s"v${i % 8}", s"w${rnd.nextInt(5)}")
    }.toDF("a", "b", "c")
    val cols = Seq("a", "b", "c")
    val got = Profile.fdDiscover(df, cols).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getAs[Boolean]("holds"))))
      .toMap
    val pairs = for (x <- cols; y <- cols if x != y) yield (x, y)
    assert(got.keySet === pairs.toSet)
    pairs.foreach { case (x, y) =>
      val want = Profile.fdCheck(df, Seq((s"$x->$y", Seq(x), Seq(y))))
        .collect().head
      assert(got((x, y)) === ((want.getAs[Long]("n_groups"),
        want.getAs[Long]("n_viol_groups"), want.getAs[Long]("n_viol_rows"),
        want.getAs[Boolean]("holds"))), s"$x -> $y")
    }
    // a%40 determines b%8 exactly (40 is a multiple of 8): a → b holds
    assert(got(("a", "b"))._4 === true)
    assert(got(("b", "a"))._4 === false)
  }

  test("benford: first digits extracted from cents, non-positive and " +
      "null excluded, absent digits emit zero rows") {
    import spark.implicits._
    // cents: 123 (d=1), 950 (d=9), 10000 (d=1), 205 (d=2); the sub-cent
    // positive (0.004 -> 0 cents), the negative, and the null all drop
    val vals = Seq(Some(1.23), Some(9.50), Some(100.00), Some(2.05),
      Some(0.004), Some(-5.0), None).toDF("v")
    val out = graft.ops.Profile.benford(vals, "v")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(4)))).toMap
    assert(out.keySet === (1L to 9L).toSet)
    assert(out(1L)._1 === 2L && out(2L)._1 === 1L && out(9L)._1 === 1L)
    assert(out(3L)._1 === 0L)
    assert(out(1L)._2 === 5000L)                 // 2 of 4
    assert(out(1L)._3 === 5000L - 3010L)         // dev vs Benford
  }
}
