package graft

import graft.functions.{CustomExpressions, DamerauLevenshteinKernel}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable
import scala.util.Random

/** The unrestricted Damerau–Levenshtein kernel against (a) goldens
  * computed with DuckDB's native `damerau_levenshtein` (the independent
  * implementation the j29 oracle gate cross-checks at data scale) and
  * (b) a test-side breadth-first edit-sequence search — a completely
  * different computation of the same metric: true DL is the MINIMUM
  * NUMBER of insert/delete/substitute/adjacent-transpose operations,
  * so shortest-path search over edit states must agree with the
  * Lowrance–Wagner matrix on every pair. */
class DamerauLevenshteinSpec extends SparkSpec {

  private def dl(a: String, b: String): Int =
    DamerauLevenshteinKernel.distance(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("goldens derived from DuckDB damerau_levenshtein") {
    val goldens = Seq(
      // the OSA discriminator: restricted OSA gives 3, true DL gives 2
      // (CA -> AC -> ABC: transposed substring edited again)
      ("CA", "ABC", 2),
      ("ab", "ba", 1),
      ("kitten", "sitting", 3), // no transpositions: plain Levenshtein
      ("", "abc", 3),
      ("abc", "", 3),
      ("", "", 0),
      ("same", "same", 0),
      ("MARTHA", "MARHTA", 1),
      ("a cat", "an act", 2),
      ("a cat", "an abct", 3),
      ("teusday", "tuesday", 1),
      ("Customer#12", "Customer#21", 1),
      ("xyz", "zyx", 2),
      ("abcdef", "badcfe", 3),
      ("12345", "21435", 2),
      ("aab", "baa", 2),
      ("abab", "baba", 2),
      ("spark", "sprak", 1),
      ("hello", "ehllo", 1),
      ("transpose", "tranpsoes", 2))
    for ((a, b, want) <- goldens) {
      assert(dl(a, b) == want, s"'$a' vs '$b'")
      assert(dl(b, a) == want, s"symmetry: '$b' vs '$a'")
    }
  }

  /** Independent reference: BFS over edit states. Intermediate strings
    * only ever need characters drawn from a ∪ b (inserting any other
    * character can be replaced by inserting the target character
    * directly), and no shortest edit sequence passes through a string
    * longer than max(|a|,|b|) + 1, so the state space is finite. */
  private def refBfs(a: String, b: String): Int = {
    if (a == b) return 0
    val alphabet = (a + b).toSet.toSeq
    val maxLen = math.max(a.length, b.length) + 1
    val seen = mutable.Set[String](a)
    var frontier = List(a)
    var depth = 0
    while (true) {
      depth += 1
      val next = mutable.ListBuffer[String]()
      for (s <- frontier) {
        val cands = mutable.ListBuffer[String]()
        for (i <- 0 until s.length) // delete
          cands += s.substring(0, i) + s.substring(i + 1)
        for (i <- 0 until s.length; c <- alphabet if c != s(i)) // substitute
          cands += s.substring(0, i) + c + s.substring(i + 1)
        if (s.length < maxLen)
          for (i <- 0 to s.length; c <- alphabet) // insert
            cands += s.substring(0, i) + c + s.substring(i)
        for (i <- 0 until s.length - 1 if s(i) != s(i + 1)) // transpose
          cands += s.substring(0, i) + s(i + 1) + s(i) + s.substring(i + 2)
        for (t <- cands) {
          if (t == b) return depth
          if (!seen(t)) { seen += t; next += t }
        }
      }
      frontier = next.toList
      if (frontier.isEmpty) return Int.MaxValue // unreachable (cannot happen)
    }
    -1 // unreachable
  }

  test("randomized parity with a BFS shortest-edit-sequence reference") {
    val rnd = new Random(20260815)
    def randStr() = {
      val n = rnd.nextInt(6)
      (0 until n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    }
    for (_ <- 1 to 300) {
      val (a, b) = (randStr(), randStr())
      assert(dl(a, b) == refBfs(a, b), s"'$a' vs '$b'")
    }
  }

  test("expression surface: Column API, SQL registration, null propagation") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(("ab", "ba"), ("CA", "ABC"), (null, "x"))
      .toDF("a", "b")
    val got = df.select(
      CustomExpressions.damerau_levenshtein(col("a"), col("b")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getInt(0))
    assert(got.toSeq == Seq(1, 2, null))
    CustomExpressions.register(spark)
    df.createOrReplaceTempView("dl_pairs")
    val sql = spark.sql(
      "SELECT damerau_levenshtein(a, b) AS d FROM dl_pairs WHERE a IS NOT NULL")
      .collect().map(_.getInt(0))
    assert(sql.toSeq == Seq(1, 2))
  }

  test("non-latin code points fall through to the map tracker") {
    // characters >= 256 exercise the HashMap fallback of the last-seen
    // alphabet tracker; transposition of two CJK chars is one edit
    assert(dl("日本", "本日") == 1)
    assert(dl("日x本", "日本") == 1)
  }
}
