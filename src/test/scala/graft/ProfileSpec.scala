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
}
