package graft

import org.apache.spark.sql.functions._
import graft.ops.Anonymize

/** k-anonymity goldens: ladder fall-through, suppression, the null
  * value class, and the release invariant on random data — the oracle
  * only replays one fixed ladder on one table. */
class AnonymizeSpec extends SparkSpec {

  import spark.implicits._

  private def ladder2 = Seq(
    Seq("city" -> col("city"), "age" -> (expr("age div 10") * 10)),
    Seq("city" -> lit("*"), "age" -> (expr("age div 10") * 10)))

  test("rows take the FIRST level that reaches k; small groups fall through") {
    // (NY, 30s) has 3 rows → safe at level 0 with k=3.
    // (SF, 30s) has 1 row → falls to level 1 where (*, 30s) counts 4.
    val df = Seq((1L, "NY", 31L), (2L, "NY", 32L), (3L, "NY", 33L),
      (4L, "SF", 35L)).toDF("id", "city", "age")
    val out = Anonymize.kAnonymity(df, "id", ladder2, k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getLong(3))).toMap
    assert(out(1L) === (("NY", "30", 0L)))
    assert(out(4L) === (("*", "30", 1L)))
  }

  test("rows safe at no level are suppressed with every QI masked") {
    // k=3 but only 2 rows exist in total: nothing can ever reach k
    val df = Seq((1L, "NY", 31L), (2L, "SF", 75L)).toDF("id", "city", "age")
    val out = Anonymize.kAnonymity(df, "id", ladder2, k = 3)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.forall(_ === (("*", "*", -1L))))
  }

  test("null QI values form their own value class via the sentinel") {
    val df = Seq((1L, null.asInstanceOf[String], 31L),
      (2L, null.asInstanceOf[String], 32L),
      (3L, null.asInstanceOf[String], 39L)).toDF("id", "city", "age")
    val out = Anonymize.kAnonymity(df, "id", ladder2, k = 3)
      .collect().map(r => (r.getString(1), r.getLong(3)))
    // all three share (null-city, 30s): released together at level 0
    assert(out.forall(_ === (("∅", 0L))))
  }

  test("k = 1 releases everything at level 0") {
    val df = Seq((1L, "NY", 31L), (2L, "SF", 75L)).toDF("id", "city", "age")
    val out = Anonymize.kAnonymity(df, "id", ladder2, k = 1).collect()
    assert(out.forall(_.getLong(3) === 0L))
  }

  test("release invariant on random data: every released row's coarsened " +
      "group has >= k members") {
    val rnd = new scala.util.Random(53)
    val rows = (1 to 300).map(i =>
      (i.toLong, s"c${rnd.nextInt(6)}", rnd.nextInt(90).toLong))
    val df = rows.toDF("id", "city", "age")
    val k = 7
    val out = Anonymize.kAnonymity(df, "id", ladder2, k)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // reference census per level over the full population
    val l0 = rows.groupBy(r => (r._2, r._3 / 10 * 10)).view.mapValues(_.size).toMap
    val l1 = rows.groupBy(r => r._3 / 10 * 10).view.mapValues(_.size).toMap
    out.foreach { case (id, city, age, lvl) =>
      val src = rows.find(_._1 == id).get
      lvl match {
        case 0L =>
          assert(city === src._2 && age === (src._3 / 10 * 10).toString)
          assert(l0((src._2, src._3 / 10 * 10)) >= k)
        case 1L =>
          assert(city === "*" && age === (src._3 / 10 * 10).toString)
          assert(l0((src._2, src._3 / 10 * 10)) < k)
          assert(l1(src._3 / 10 * 10) >= k)
        case -1L =>
          assert(city === "*" && age === "*")
          assert(l1(src._3 / 10 * 10) < k)
        case other => fail(s"unexpected level $other")
      }
    }
  }

  test("lDiversity: constant-sensitive group flags, null sensitive is one value class") {
    import spark.implicits._
    val released = Seq(
      ("a", Some(10L)), ("a", Some(10L)), ("a", Some(10L)), // constant → not diverse
      ("b", Some(1L)), ("b", Some(2L)), ("b", Some(3L)),    // 3 distinct → ok at l=3
      ("c", None), ("c", None), ("c", Some(9L))             // nulls collapse: 2 classes
    ).toDF("qi", "sens")
    val out = Anonymize.lDiversity(released, Seq("qi"), "sens", l = 3)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out === Map(
      "a" -> ((3L, 1L, false)),
      "b" -> ((3L, 3L, true)),
      "c" -> ((3L, 2L, false))))
  }

  test("tCloseness: matching distribution is 0, disjoint extremes hit the EMD golden") {
    import spark.implicits._
    // global = {lv0: 2, lv1: 2}; group a all lv0, group b all lv1 —
    // P=(1,0) vs Q=(½,½): EMD = ½ → 5000 bp for both groups
    val skewed = Seq(("a", 0L), ("a", 0L), ("b", 1L), ("b", 1L)).toDF("qi", "lv")
    val s = Anonymize.tCloseness(skewed, Seq("qi"), "lv", tBp = 2000)
      .collect().map(r => r.getString(0) -> ((r.getAs[Long]("t_bp"),
        r.getAs[Boolean]("t_ok")))).toMap
    assert(s === Map("a" -> ((5000L, false)), "b" -> ((5000L, false))))
    // every group mirrors the global mix exactly → t = 0 everywhere
    val even = Seq(("a", 0L), ("a", 1L), ("b", 0L), ("b", 1L)).toDF("qi", "lv")
    val e = Anonymize.tCloseness(even, Seq("qi"), "lv", tBp = 2000).collect()
    assert(e.forall(r => r.getAs[Long]("t_bp") == 0L && r.getAs[Boolean]("t_ok")))
  }

  test("tCloseness: a level MISSING from a group still moves earth (dense grid)") {
    import spark.implicits._
    // group a has no lv1 rows; the middle level must still accumulate:
    // global = {0:2, 1:2, 2:2}, group a = {0:1, 2:1}
    // cum shares: P = (1/2, 1/2, 1), Q = (1/3, 2/3, 1)
    // EMD = (1/6 + 1/6 + 0) / 2 = 1/6 → 1666 bp
    val df = Seq(("a", 0L), ("a", 2L), ("b", 0L), ("b", 1L), ("b", 1L),
      ("b", 2L)).toDF("qi", "lv")
    val a = Anonymize.tCloseness(df, Seq("qi"), "lv", tBp = 2000)
      .where($"qi" === "a").collect().head
    assert(a.getAs[Long]("t_bp") == 1666L && a.getAs[Boolean]("t_ok"))
  }

  test("tCloseness: null QI groups and a null sensitive level stay in the walk") {
    import spark.implicits._
    // global = {null: 3, 1: 3}, m = 2 (null is a level of its own, first
    // in the cumulative order). Group a all-null → EMD ½ → 5000 bp;
    // group b all-1 → 5000 bp; the null-QI group mirrors the global mix
    // exactly → 0 bp. Before the null-safe join these groups lost their
    // cells entirely (null != null) while still counted in n_rows/N.
    val df = Seq(
      (Option("a"), Option.empty[Long]), (Option("a"), Option.empty[Long]),
      (Option("b"), Option(1L)), (Option("b"), Option(1L)),
      (Option.empty[String], Option.empty[Long]),
      (Option.empty[String], Option(1L))).toDF("qi", "lv")
    val out = Anonymize.tCloseness(df, Seq("qi"), "lv", tBp = 2000)
      .collect().map(r => Option(r.getString(0)) ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("t_bp")))).toMap
    assert(out === Map(
      Some("a") -> ((2L, 5000L)),
      Some("b") -> ((2L, 5000L)),
      None      -> ((2L, 0L))))
  }
}
