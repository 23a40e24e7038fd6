package graft

import graft.ops.Cdc

/** CDC apply goldens: last-writer-wins, tombstones, resurrection after
  * delete, and the sequence tie order — the oracle only replays one
  * fixed stream via the window formulation. */
class CdcSpec extends SparkSpec {

  import spark.implicits._

  private def apply(rows: Seq[(Long, Long, Long, String, String)]) =
    Cdc.applyChanges(rows.toDF("k", "seq", "tie", "op", "payload"),
        Seq("k"), Seq("seq", "tie"), "op", Seq("payload"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap

  test("last writer wins; a trailing delete removes the key") {
    val out = apply(Seq(
      (1L, 1L, 0L, "upsert", "a"), (1L, 2L, 0L, "upsert", "b"),
      (2L, 1L, 0L, "upsert", "x"), (2L, 2L, 0L, "delete", "-")))
    assert(out === Map(1L -> (("b", 2L))))
  }

  test("an upsert AFTER a delete resurrects the key") {
    val out = apply(Seq(
      (1L, 1L, 0L, "upsert", "a"), (1L, 2L, 0L, "delete", "-"),
      (1L, 3L, 0L, "upsert", "c")))
    assert(out === Map(1L -> (("c", 3L))))
  }

  test("equal primary sequence breaks by the tie column") {
    val out = apply(Seq(
      (1L, 5L, 1L, "upsert", "first"), (1L, 5L, 2L, "upsert", "second")))
    assert(out === Map(1L -> (("second", 2L))))
  }

  test("n_changes counts every change, deletes included") {
    val out = apply(Seq(
      (1L, 1L, 0L, "delete", "-"), (1L, 2L, 0L, "upsert", "a"),
      (1L, 3L, 0L, "delete", "-"), (1L, 4L, 0L, "upsert", "b")))
    assert(out === Map(1L -> (("b", 4L))))
  }

  test("survivorship: per-field latest non-null — a later null patch never clobbers") {
    import graft.ops.Survivorship
    val updates = Seq(
      // key 1, field "name": real value at seq 1, null patch at seq 9 → seq-1 value survives
      (1L, "name", 1L, 0L, Some("ada")),
      (1L, "name", 9L, 0L, None),
      // key 1, field "mail": two real values → latest wins; tie column breaks seq ties
      (1L, "mail", 5L, 1L, Some("a@x")),
      (1L, "mail", 5L, 2L, Some("b@x")),
      // key 2 only ever got null patches for "name" → NO row
      (2L, "name", 3L, 0L, None),
      (2L, "mail", 3L, 0L, Some("c@x"))
    ).toDF("k", "field", "seq", "tie", "v")
    val out = Survivorship.goldenRecord(updates, Seq("k"), "field", "v", Seq("seq", "tie"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getString(4), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out === Map(
      (1L, "name") -> (("ada", 1L, 0L)),
      (1L, "mail") -> (("b@x", 5L, 2L)),
      (2L, "mail") -> (("c@x", 3L, 0L))))
  }

  test("compact: net-effect classification incl. born-and-died 'none'") {
    import spark.implicits._
    val log = Seq(
      (1L, 1L, "I", "a"), (1L, 2L, "U", "a2"),              // insert, final a2
      (2L, 1L, "I", "b"), (2L, 2L, "D", null),              // none
      (3L, 1L, "U", "c"), (3L, 2L, "U", "c2"),              // update
      (4L, 1L, "U", "d"), (4L, 2L, "D", null),              // delete
      (5L, 1L, "I", "e"),                                   // bare insert
      (6L, 1L, "D", null)                                   // tombstone only
    ).toDF("k", "seq", "op", "v")
    val got = graft.ops.Cdc.compact(log, "k", "seq", "op", "v").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2),
        r.getAs[Long]("n_ops")))).toMap
    // final_val = last NON-delete payload: a tombstone carries no
    // payload, so delete-/none-classified keys keep their last live
    // value (auditable), and an all-deletes key is null.
    assert(got === Map(
      1L -> (("insert", "a2", 2L)),
      2L -> (("none", "b", 2L)),
      3L -> (("update", "c2", 2L)),
      4L -> (("delete", "d", 2L)),
      5L -> (("insert", "e", 1L)),
      6L -> (("delete", null, 1L))))
  }
}
