package graft

import graft.ops.Integrity
import org.apache.spark.sql.functions._

/** Merkle table fingerprint: tamper evidence (a one-character change
  * moves exactly its bucket hash and the root), layout independence
  * (partitioning never changes the fingerprint), and structural
  * locality (bucket rows outside the tampered range stay identical). */
class MerkleSpec extends SparkSpec {

  import spark.implicits._

  private def table(mutate: Boolean) =
    (0L until 40L).map(i =>
      (i, if (mutate && i == 17L) "payload-17-TAMPERED" else s"payload-$i"))
      .toDF("id", "text")

  test("tamper in one row moves its bucket hash and the root, nothing else") {
    val clean = Integrity.merkle(table(mutate = false), "id", "text",
      expr("id div 10")).collect()
      .map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Long]("n_rows"), r.getAs[String]("bucket_hash"),
          r.getAs[String]("root")))).toMap
    val dirty = Integrity.merkle(table(mutate = true), "id", "text",
      expr("id div 10")).collect()
      .map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Long]("n_rows"), r.getAs[String]("bucket_hash"),
          r.getAs[String]("root")))).toMap
    assert(clean.keySet === Set(0L, 1L, 2L, 3L))
    // row 17 lives in bucket 1: only that bucket hash changes
    assert(clean(1L)._2 !== dirty(1L)._2)
    Seq(0L, 2L, 3L).foreach(b => assert(clean(b)._2 === dirty(b)._2, s"bucket $b"))
    // the root always changes, and is the same value on every row
    assert(clean(0L)._3 !== dirty(0L)._3)
    assert(clean.values.map(_._3).toSet.size === 1)
    assert(clean.values.forall(_._1 === 10L))
  }

  test("fingerprint is independent of physical layout") {
    val base = table(mutate = false)
    val a = Integrity.merkle(base.repartition(7, $"text"), "id", "text",
      expr("id div 10")).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[String]("bucket_hash"),
        r.getAs[String]("root"))).toSet
    val b = Integrity.merkle(base.repartition(2, $"id"), "id", "text",
      expr("id div 10")).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[String]("bucket_hash"),
        r.getAs[String]("root"))).toSet
    assert(a === b)
  }
}
