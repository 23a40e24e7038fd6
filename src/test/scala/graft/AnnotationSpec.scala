package graft

import org.apache.spark.sql.functions.col
import graft.ext.{Frequency, Preference, TextStats}

/** Hand-computed goldens for the annotation / preference / eval
  * operators (Fleiss' κ, Bradley–Terry MM, ROUGE overlap) — every
  * number below is derived in the comment next to it, independently of
  * both the Spark implementation and the DuckDB oracle. */
class AnnotationSpec extends SparkSpec {
  import spark.implicits._

  test("fleissKappa: worked 3-item/3-rater panel, incomplete item " +
      "dropped, negative kappa exact") {
    // i1: A,A,A  i2: A,A,B  i3: A,B,C  i4: A,A (INCOMPLETE -> dropped)
    // N=3 T=9 A=9+5+3=17  C=(6,2,1) S2=36+4+1=41
    // num = T(A-T) - 2*S2 = 72 - 82 = -10 ; den = 2*(81-41) = 80
    // kappa = -0.125 -> -1250 bp (sign-before-division)
    val df = Seq(
      (1L, "A"), (1L, "A"), (1L, "A"),
      (2L, "A"), (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "B"), (3L, "C"),
      (4L, "A"), (4L, "A")).toDF("item", "label")
    val r = Frequency.fleissKappa(df, "item", "label", raters = 3).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("n_items") === 3L)
    assert(row.getAs[Long]("n_raters") === 3L)
    assert(row.getAs[Long]("sum_sq") === 17L)
    assert(row.getAs[Long]("s2_cat") === 41L)
    assert(row.getAs[Long]("kappa_bp") === -1250L)
  }

  test("fleissKappa: unanimity is the degenerate denominator -> 0, " +
      "not a division error") {
    val df = Seq((1L, "A"), (1L, "A"), (2L, "A"), (2L, "A"))
      .toDF("item", "label")
    val row = Frequency.fleissKappa(df, "item", "label", raters = 2)
      .collect().head
    assert(row.getAs[Long]("kappa_bp") === 0L)
  }

  test("krippendorffAlpha: worked incomplete-panel example — the items " +
      "fleissKappa would drop still count, singletons don't") {
    // u1: A,A (m=2)  u2: A,B (m=2)  u3: B,B,B (m=3)  u4: A (m=1 DROPPED)
    // n=7, C=(3,4) S2=25
    // D_o = (1/7)(0 + 2 + 0) = 2/7 -> do_bp floor = 2857
    // D_e = (49-25)/42 = 4/7 ; alpha = 1 - (2/7)/(4/7) = 0.5 -> 5000 bp
    val df = Seq(
      (1L, "A"), (1L, "A"),
      (2L, "A"), (2L, "B"),
      (3L, "B"), (3L, "B"), (3L, "B"),
      (4L, "A")).toDF("item", "label")
    val row = Frequency.krippendorffAlpha(df, "item", "label").collect().head
    assert(row.getAs[Long]("n_items") === 3L)
    assert(row.getAs[Long]("n_values") === 7L)
    assert(row.getAs[Long]("do_bp") === 2857L)
    assert(row.getAs[Long]("s2_cat") === 25L)
    assert(row.getAs[Long]("alpha_bp") === 5000L)
  }

  test("krippendorffAlpha: unanimity degenerates to 0; an over-wide " +
      "panel fails the maxRaters gate loudly") {
    val uni = Seq((1L, "A"), (1L, "A"), (2L, "A"), (2L, "A"))
      .toDF("item", "label")
    assert(Frequency.krippendorffAlpha(uni, "item", "label")
      .collect().head.getAs[Long]("alpha_bp") === 0L)
    val wide = Seq.fill(33)((1L, "A")).toDF("item", "label")
    val e = intercept[IllegalArgumentException] {
      Frequency.krippendorffAlpha(wide, "item", "label")
    }
    assert(e.getMessage.contains("maxRaters"))
  }

  test("condorcetCycles: a planted 3-cycle counts once; the transitive " +
      "triple and the tied pair count zero") {
    // A>B (2-1), B>C, C>A  -> cycle; A>D; B-D, C-D never met
    val cyc = Seq(("A", "B"), ("A", "B"), ("B", "A"), ("B", "C"),
      ("C", "A"), ("A", "D")).toDF("winner", "loser")
    val r1 = Preference.condorcetCycles(cyc).collect().head
    assert(r1.getAs[Long]("n_players") === 4L)
    assert(r1.getAs[Long]("n_dominances") === 4L)
    assert(r1.getAs[Long]("n_comparable_triples") === 1L)
    assert(r1.getAs[Long]("n_cycles") === 1L)
    assert(r1.getAs[Long]("cycle_bp") === 10000L)
    // transitive: A>B, B>C, A>C -> comparable 1, cycles 0
    val tr = Seq(("A", "B"), ("B", "C"), ("A", "C")).toDF("winner", "loser")
    val r2 = Preference.condorcetCycles(tr).collect().head
    assert(r2.getAs[Long]("n_comparable_triples") === 1L)
    assert(r2.getAs[Long]("n_cycles") === 0L)
    assert(r2.getAs[Long]("cycle_bp") === 0L)
    // a 1-1 split is incomparable: zero dominances
    val tie = Seq(("A", "B"), ("B", "A")).toDF("winner", "loser")
    assert(Preference.condorcetCycles(tie).collect().head
      .getAs[Long]("n_dominances") === 0L)
  }

  test("bradleyTerry: 3-1 head-to-head fixes strengths at the exact " +
      "3:1 ratio (MM fixpoint reached from p = 1)") {
    // W_A=3, W_B=1, n=4: p_A <- 3(p_A+p_B)/4, p_B <- (p_A+p_B)/4 —
    // sum stays 2, fixpoint (1.5, 0.5) -> normalized (0.75, 0.25)
    val df = Seq(("A", "B"), ("A", "B"), ("A", "B"), ("B", "A"))
      .toDF("winner", "loser")
    val r = Preference.bradleyTerry(df).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getDouble(3), x.getLong(4))).sortBy(_._1)
    assert(r === Array(("A", 3L, 4L, 0.75, 1L), ("B", 1L, 4L, 0.25, 2L)))
  }

  test("bradleyTerry: a circular tournament is symmetric — equal " +
      "strengths, rank ties broken by player name") {
    val df = Seq(("A", "B"), ("B", "C"), ("C", "A")).toDF("winner", "loser")
    val r = Preference.bradleyTerry(df).collect()
      .map(x => (x.getString(0), x.getDouble(3), x.getLong(4))).sortBy(_._1)
    assert(r === Array(("A", 0.333333, 1L), ("B", 0.333333, 2L),
      ("C", 0.333333, 3L)))
  }

  test("bradleyTerry: the maxPlayers count gate throws loudly") {
    val df = Seq(("A", "B"), ("B", "C")).toDF("winner", "loser")
    val e = intercept[IllegalArgumentException] {
      Preference.bradleyTerry(df, maxPlayers = 2)
    }
    assert(e.getMessage.contains("maxPlayers"))
  }

  test("plan audit: fleissKappa and rougeOverlap are window-free " +
      "partial aggregates (the 100TB shape, not a per-item sort)") {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"))
    val fk = Frequency.fleissKappa(li, "l_orderkey", "l_returnflag", 4)
      .queryExecution.executedPlan.toString
    assert(!fk.contains("Window"), fk)
    assert("HashAggregate".r.findAllIn(fk).size >= 2, fk)
    val d = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").as("pair_id"), col("text").as("cand"),
        col("text").as("ref"))
    val ro = TextStats.rougeOverlap(d)
      .queryExecution.executedPlan.toString
    assert(!ro.contains("Window") && !ro.contains("Cartesian"), ro)
    assert("HashAggregate".r.findAllIn(ro).size >= 2, ro)
  }

  test("rougeOverlap: clipped unigram/bigram counts by hand, " +
      "empty-side zeros") {
    // pair 1: cand "the cat sat" / ref "the cat the cat"
    //   uni: overlap min(1,2)+min(1,2)=2, totals 3/4 ->
    //        prec 6666, rec 5000, f1 (2*6666*5000)//11666 = 5714
    //   bi:  cand {the cat, cat sat}, ref {the cat x2, cat the}
    //        overlap 1, totals 2/3 -> prec 5000, rec 3333,
    //        f1 (2*5000*3333)//8333 = 3999
    // pair 2: empty candidate -> all zeros at n=1 and n=2
    val df = Seq(
      (1L, "the cat sat", "the cat the cat"),
      (2L, "  ", "the cat")).toDF("pair_id", "cand", "ref")
    val r = TextStats.rougeOverlap(df).orderBy(col("pair_id"), col("n"))
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5), x.getLong(6), x.getLong(7)))
    assert(r === Array(
      (1L, 1L, 3L, 4L, 2L, 6666L, 5000L, 5714L),
      (1L, 2L, 2L, 3L, 1L, 5000L, 3333L, 3999L),
      (2L, 1L, 0L, 2L, 0L, 0L, 0L, 0L),
      (2L, 2L, 0L, 1L, 0L, 0L, 0L, 0L)))
  }
}
