package graft

import java.security.MessageDigest

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Dedup
import graft.functions.WinnowKernel

/** Seeded randomized equivalence tests: each operator kernel against an
  * independent, naively-written reference implementation. Fixed seeds
  * keep failures reproducible; the naive forms are deliberately the
  * dumbest correct code (quadratic/recursive) so a shared bug with the
  * optimized kernels is implausible. */
class RandomizedSpec extends AnyFunSuite {

  // --- naive winnowing: O(n·w) with per-window rescan, Java-string chars ---
  private def naiveWinnow(s: String, k: Int, w: Int): Seq[Long] = {
    val t = UTF8String.fromString(s).toLowerCase.toString
    val cps = t.codePoints().toArray
    def gram(i: Int) = new String(cps, i, k)
    val md = MessageDigest.getInstance("MD5")
    def h(g: String): Long = {
      val d = md.digest(g.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    val nGrams = cps.length - k + 1
    if (nGrams <= 0) Seq.empty
    else {
      val hs = (0 until nGrams).map(i => h(gram(i)))
      if (nGrams < w) Seq(hs.min)
      else (0 to nGrams - w).map(j => hs.slice(j, j + w).min).distinct.sorted
    }
  }

  test("winnow kernel == naive reference on 300 random mixed-script strings") {
    val rnd = new scala.util.Random(42)
    val alphabets = Seq(
      "abcdefgh ",                       // ascii, repetitive
      "abc 中文字符 def!?.,",            // mixed CJK + punctuation
      "aaaaaaaab",                       // near-constant (duplicate hashes)
      "αβγδ εζηθ")                       // greek (2-byte UTF-8)
    for (caseIdx <- 1 to 300) {
      val ab = alphabets(rnd.nextInt(alphabets.length))
      val len = rnd.nextInt(30) // includes 0..4 (sub-k) and 5..8 (sub-window)
      val s = Seq.fill(len)(ab(rnd.nextInt(ab.length))).mkString
      val kernel = WinnowKernel.winnow(UTF8String.fromString(s), 5, 4)
        .toLongArray().toSeq
      assert(kernel === naiveWinnow(s, 5, 4),
        s"case $caseIdx diverged on input ${s.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  // --- naive connected components: driver-side union-find ---
  private def naiveComponents(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map((1L to n).map(i => i -> i): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) => parent(find(a)) = find(b) }
    // canonical label = min id in the component
    val byRoot = (1L to n).groupBy(find)
    byRoot.flatMap { case (_, ids) => ids.map(_ -> ids.min) }.toMap
  }

  test("resolveComponents == union-find on random graphs (sparse, dense, hub-heavy)") {
    import TestSpark.spark.implicits._
    val rnd = new scala.util.Random(7)
    val shapes = Seq(
      (40, 20),   // sparse: forests + short paths
      (30, 60),   // dense: big merged clusters
      (50, 25))   // mid
    shapes.foreach { case (n, m) =>
      val edges = Seq.fill(m)((rnd.nextInt(n) + 1L, rnd.nextInt(n) + 1L))
        .filter { case (a, b) => a != b }
      val docs = (1L to n).toDF("doc_id")
      val pairs = edges.toDF("id_a", "id_b")
      val got = Dedup.resolveComponents(docs, pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === naiveComponents(n, edges), s"graph n=$n m=$m")
    }
  }
}
