package graft

import org.apache.spark.sql.functions._
import graft.functions.CustomExpressions

/** SimilarityPruning rule: the implied length bounds appear in the
  * optimized plan, exactly once, and NEVER change results — soundness
  * checked against independent driver-side kernels on random strings. */
class SimilarityPruningSpec extends SparkSpec {

  import spark.implicits._

  private def randPairs(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    def word() = (0 until rnd.nextInt(12))
      .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    (1 to n).map(_ => (word(), word()))
  }

  // plan-shape tests read parquet: a LocalRelation source lets
  // ConvertToLocalRelation fold the whole Filter away (the documented
  // toy-scale pitfall from the DPP work) and there is no plan to pin
  test("levenshtein threshold filter gains the length-difference bound") {
    val df = Tables.load(spark, sfDir, "customer")
      .where(levenshtein($"c_name", $"c_mktsegment") <= 3)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("abs((length(c_name") && plan.contains("length(c_mktsegment"),
      s"bound missing from:\n$plan")
  }

  test("fuzz_ratio threshold gains the min-length bound, exactly once") {
    val df = Tables.load(spark, sfDir, "customer")
      .where(CustomExpressions.fuzz_ratio($"c_name", $"c_mktsegment") >= 60)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("400"), s"bound missing from:\n$plan")
    // fixed-point optimizer must not stack the bound
    assert("least\\(".r.findAllIn(plan).size === 1, s"stacked bound:\n$plan")
  }

  test("damerau_levenshtein threshold filter gains the length-difference bound") {
    val df = Tables.load(spark, sfDir, "customer")
      .where(CustomExpressions.damerau_levenshtein($"c_name", $"c_mktsegment") <= 2)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("abs((length(c_name") && plan.contains("length(c_mktsegment"),
      s"bound missing from:\n$plan")
    assert("abs\\(".r.findAllIn(plan).size === 1, s"stacked bound:\n$plan")
  }

  test("soundness: damerau_levenshtein filter identical with the rule on random strings") {
    // the bound must never drop a row: compare the thresholded filter
    // against the raw kernel evaluated without any threshold predicate
    // (projected, so the rule has no comparison to rewrite)
    val pairs = randPairs(seed = 97, n = 400).toDF("a", "b")
    val kept = pairs
      .where(CustomExpressions.damerau_levenshtein($"a", $"b") <= 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val reference = pairs
      .select($"a", $"b",
        CustomExpressions.damerau_levenshtein($"a", $"b").as("d"))
      .collect().filter(_.getInt(2) <= 2)
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(kept === reference)
    assert(reference.nonEmpty)
  }

  test("jaro_winkler_bp threshold gains the length-ratio bound, exactly once") {
    val df = Tables.load(spark, sfDir, "customer")
      .where(CustomExpressions.jaro_winkler_bp($"c_name", $"c_mktsegment") >= 9201)
    val plan = df.queryExecution.optimizedPlan.toString
    // (t - 8000) = 1201 against 2000·least(len)
    assert(plan.contains("1201") && plan.contains("2000"), s"bound missing from:\n$plan")
    assert("least\\(".r.findAllIn(plan).size === 1, s"stacked bound:\n$plan")
  }

  test("jaro_winkler_bp threshold at or below 8000 gains NO (vacuous) bound") {
    val df = Tables.load(spark, sfDir, "customer")
      .where(CustomExpressions.jaro_winkler_bp($"c_name", $"c_mktsegment") >= 8000)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("least("), s"vacuous bound added:\n$plan")
  }

  test("soundness: levenshtein filter results identical to a naive reference") {
    def lev(s: String, t: String): Int = {
      val d = Array.tabulate(s.length + 1, t.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to s.length; j <- 1 to t.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j), d(i)(j - 1)) + 1,
          d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
      d(s.length)(t.length)
    }
    val pairs = randPairs(61, 300)
    for (thr <- Seq(0, 1, 3, 6)) {
      val got = pairs.toDF("a", "b")
        .where(levenshtein($"a", $"b") <= thr)
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      val want = pairs.filter(p => lev(p._1, p._2) <= thr)
      assert(got.sorted === want.sorted, s"thr=$thr")
    }
  }

  test("soundness: fuzz_ratio filter survives the rounding edge the bound " +
      "must absorb") {
    val pairs = randPairs(67, 300)
    for (thr <- Seq(1, 50, 67, 100)) {
      val got = pairs.toDF("a", "b")
        .where(CustomExpressions.fuzz_ratio($"a", $"b") >= thr)
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      val want = pairs.filter { case (a, b) =>
        graft.functions.ExprUtil.fuzzRatio(
          org.apache.spark.unsafe.types.UTF8String.fromString(a),
          org.apache.spark.unsafe.types.UTF8String.fromString(b)) >= thr
      }
      assert(got.sorted === want.sorted, s"thr=$thr")
    }
  }

  test("the bound also lands inside join residual conditions") {
    val l = Seq((1L, "abc")).toDF("k", "a")
    val r = Seq((1L, "abcdefgh")).toDF("k2", "b")
    val df = l.join(r, $"k" === $"k2" && levenshtein($"a", $"b") <= 2)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("abs((length(a"), s"bound missing from:\n$plan")
    assert(df.count() === 0L) // pruned: |3-8| > 2, and true distance 5 > 2
  }
}
