package graft

import org.apache.spark.sql.functions._
import graft.ops.SnapshotDiff

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies added/removed/changed, drops unchanged, null-safe") {
    val before = Seq(
      (1L, Some("a"), 1.0),   // unchanged
      (2L, Some("b"), 2.0),   // value change
      (3L, None, 3.0),        // null -> value change
      (4L, Some("d"), 4.0))   // removed
      .toDF("k", "s", "v")
    val after = Seq(
      (1L, Some("a"), 1.0),
      (2L, Some("b2"), 2.0),
      (3L, Some("c"), 3.0),
      (5L, Some("e"), 5.0))   // added
      .toDF("k", "s", "v")
    val got = SnapshotDiff.diff(before, after, Seq("k")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        Option(r.getString(2)), Option(r.getString(3))))).toMap
    assert(got.keySet === Set(2L, 3L, 4L, 5L))
    assert(got(2L) === (("changed", Some("b"), Some("b2"))))
    assert(got(3L) === (("changed", None, Some("c"))))
    assert(got(4L)._1 === "removed" && got(4L)._3 === None)
    assert(got(5L)._1 === "added" && got(5L)._2 === None)
  }

  test("diff is antisymmetric: swapping snapshots swaps added/removed") {
    val x = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val y = Seq((2L, "b"), (3L, "c")).toDF("k", "s")
    def types(b: org.apache.spark.sql.DataFrame, a: org.apache.spark.sql.DataFrame) =
      SnapshotDiff.diff(b, a, Seq("k")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(types(x, y) === Map(1L -> "removed", 3L -> "added"))
    assert(types(y, x) === Map(3L -> "removed", 1L -> "added"))
  }
}
