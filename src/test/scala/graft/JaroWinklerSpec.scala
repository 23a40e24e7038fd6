package graft

import graft.functions.{CustomExpressions, JaroWinklerKernel}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The Jaro–Winkler kernel against (a) goldens computed with DuckDB's
  * native `jaro_winkler_similarity` (an independent C++ implementation
  * of the same published algorithm — the same one the j23 oracle gate
  * cross-checks at data scale), and (b) a test-side exact-rational
  * reference using BigInt arithmetic and a different matching
  * structure, on randomized pairs. */
class JaroWinklerSpec extends SparkSpec {

  import spark.implicits._

  private def bp(a: String, b: String): Int =
    JaroWinklerKernel.jaroWinklerBp(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("goldens derived from DuckDB jaro_winkler_similarity") {
    // floor(sim * 10^4) of DuckDB's values, which are the exact
    // rationals up to double rounding (every case below is > 1e-4 from
    // an integer boundary except the exact ones, which floor cleanly)
    val goldens = Seq(
      ("MARTHA", "MARHTA", 9611), // prefix 3, one transposition
      ("DIXON", "DICKSONX", 8133), // prefix 2, unequal lengths
      ("JELLYFISH", "SMELLYFISH", 8962), // no common prefix → no boost
      ("DWAYNE", "DUANE", 8400), // prefix 1
      ("CRATE", "TRACE", 7333), // jaro > 0.7 but prefix 0
      ("abcdx", "abcdy", 9200), // prefix cap: 4 of 4
      ("aaaaaaaaaa", "aaaaaaaaab", 9600),
      ("ABCDEFGH", "ABCDEFGX", 9500), // 7-char prefix capped at 4
      ("ABCXXXXXXX", "ABCYYYYYYY", 5333), // jaro ≤ 0.7 → NO boost despite prefix 3
      ("ABCD", "ABCE", 8833),
      ("ABCDEF", "ABCDEF", 10000),
      ("A", "A", 10000),
      ("AB", "BA", 0), // window 0: no same-position match
      ("A", "", 0),
      ("", "", 0)) // DuckDB convention: empty-empty is 0, not 1
    for ((a, b, want) <- goldens)
      assert(bp(a, b) == want, s"'$a' vs '$b'")
    // symmetry on the asymmetric-length cases
    assert(bp("DIXON", "DICKSONX") == bp("DICKSONX", "DIXON"))
  }

  /** Exact-rational reference: candidate matching via explicit index
    * lists, arithmetic via BigInt fractions (no Long-overflow concerns,
    * no floats anywhere). */
  private def refBp(a: String, b: String): Int = {
    if (a.isEmpty || b.isEmpty) return 0
    val window = math.max(math.max(a.length, b.length) / 2 - 1, 0)
    val bUsed = collection.mutable.Set[Int]()
    val aIdx = collection.mutable.ArrayBuffer[Int]()
    val bIdx = collection.mutable.ArrayBuffer[Int]()
    for (i <- a.indices) {
      val cand = (math.max(0, i - window) to math.min(b.length - 1, i + window))
        .find(j => !bUsed(j) && b(j) == a(i))
      cand.foreach { j => bUsed += j; aIdx += i; bIdx += j }
    }
    val m = aIdx.size
    if (m == 0) return 0
    val bOrdered = bIdx.sorted.map(b(_))
    val t2 = aIdx.map(a(_)).zip(bOrdered).count { case (x, y) => x != y }
    val l1 = a.length
    val l2 = b.length
    val num = BigInt(2) * m * m * l2 + BigInt(2) * m * m * l1 +
      BigInt(2 * m - t2) * l1 * l2
    val den = BigInt(6) * l1 * l2 * m
    val prefix = a.zip(b).take(4).takeWhile { case (x, y) => x == y }.size
    val (n2, d2) =
      if (num * 10 > den * 7) (BigInt(10 - prefix) * num + BigInt(prefix) * den, den * 10)
      else (num, den)
    (BigInt(10000) * n2 / d2).toInt
  }

  test("kernel == exact-rational reference on 3000 random pairs") {
    val rnd = new scala.util.Random(7L)
    def rs(maxLen: Int): String = {
      val alphabet = "abcdAB01 é中"
      (1 to rnd.nextInt(maxLen + 1)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val mismatches = (1 to 3000).flatMap { _ =>
      val (a, b) = (rs(10), rs(if (rnd.nextBoolean()) 10 else 25))
      val got = bp(a, b)
      val want = refBp(a, b)
      if (got != want) Some(s"'$a' vs '$b': kernel=$got ref=$want") else None
    }
    assert(mismatches.isEmpty, mismatches.take(5).mkString("\n"))
  }

  test("pruning bound soundness: jw >= t implies the length-ratio bound") {
    val rnd = new scala.util.Random(11L)
    def rs(): String = (1 to (1 + rnd.nextInt(12))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    val t = 9201
    for (_ <- 1 to 3000) {
      val (a, b) = (rs(), rs())
      if (bp(a, b) >= t) {
        val (mn, mx) = (math.min(a.length, b.length), math.max(a.length, b.length))
        assert(2000 * mn >= (t - 8000) * mx, s"bound violated for '$a' vs '$b'")
      }
    }
  }

  test("expression surface: codegen, SQL registration, null propagation") {
    val df = Seq(("MARTHA", "MARHTA"), (null, "x"), ("x", null))
      .toDF("a", "b")
    val out = df.select(
      CustomExpressions.jaro_winkler_bp(col("a"), col("b")).as("bp"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getInt(0))
    assert(out.toSeq == Seq(9611, null, null))
    df.createOrReplaceTempView("jw_in")
    val sql = spark.sql("SELECT jaro_winkler_bp(a, b) AS bp FROM jw_in WHERE a IS NOT NULL AND b IS NOT NULL")
      .collect().map(_.getInt(0))
    assert(sql.toSeq == Seq(9611))
  }
}
