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

  // --- naive segment dedup: sequential first-occurrence scan ---
  private def naiveSegmentDedup(docs: Seq[(Long, String)], segLen: Int)
      : Map[Long, (Long, Long, String)] = {
    val seen = scala.collection.mutable.HashSet.empty[String]
    docs.sortBy(_._1).map { case (id, text) =>
      val toks = text.toLowerCase.split("\\s+", -1).toSeq
      val segs = toks.grouped(segLen).map(_.mkString(" ")).toSeq
      val kept = segs.filter(s => seen.add(s))
      id -> ((segs.size.toLong, kept.size.toLong, kept.mkString(" ")))
    }.toMap
  }

  test("segmentDedup == sequential first-occurrence reference on random corpora") {
    import TestSpark.spark.implicits._
    val rnd = new scala.util.Random(41)
    val vocab = (1 to 6).map(i => s"w$i") // tiny vocab → heavy collisions
    val docs = (1L to 60L).map { id =>
      val n = rnd.nextInt(30) + 1
      id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val got = Dedup.segmentDedup(docs.toDF("doc_id", "text"), segLen = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got === naiveSegmentDedup(docs, 4))
  }

  // --- naive gap fill: per-key sequential grid walk ---
  test("gapFill == sequential per-key reference on random sparse series") {
    import TestSpark.spark.implicits._
    val rnd = new scala.util.Random(13)
    val events = (1 to 400).map { i =>
      val user = rnd.nextInt(6).toLong
      val sec = rnd.nextInt(50000).toLong
      (user, new java.sql.Timestamp(sec * 1000L), i.toLong, rnd.nextInt(1000) / 10.0)
    }
    val got = graft.ops.Resample.gapFill(
        events.toDF("user_id", "ts", "event_id", "value"), 3600L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4))))
      .toMap
    val want = events.groupBy(_._1).flatMap { case (u, evs) =>
      val byBucket = evs.groupBy(e => e._2.getTime / 1000L / 3600L)
      val (mn, mx) = (byBucket.keys.min, byBucket.keys.max)
      var lastVal: Option[Long] = None
      (mn to mx).map { b =>
        val obs = byBucket.get(b).map { es =>
          val last = es.maxBy(e => (e._2.getTime, e._3))
          (es.size.toLong, math.floor(last._4 * 10000.0).toLong)
        }
        obs.foreach { case (_, v) => lastVal = Some(v) }
        (u, b) -> ((obs.map(_._1).getOrElse(0L), obs.map(_._2), lastVal.get))
      }
    }
    assert(got === want)
  }

  test("activeTime == sequential interval-union reference on random bursts") {
    import TestSpark.spark.implicits._
    val rnd = new scala.util.Random(23)
    val w = 120L
    val rows = (1 to 500).map { _ =>
      (rnd.nextInt(6).toLong,
        new java.sql.Timestamp(1704067200000L + rnd.nextInt(40000) * 1000L))
    }
    val got = graft.ops.Journeys.activeTime(
        rows.toDF("user_id", "ts"), windowSeconds = w)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val want = rows.groupBy(_._1).map { case (u, es) =>
      val starts = es.map(_._2.getTime / 1000L).sorted
      var bursts = 0L; var covered = 0L
      var curS = -1L; var curE = -1L
      starts.foreach { s =>
        if (curE < 0 || s > curE) {
          if (curE >= 0) covered += curE - curS
          bursts += 1; curS = s; curE = s + w
        } else curE = math.max(curE, s + w)
      }
      covered += curE - curS
      u -> ((bursts, covered))
    }
    assert(got === want)
  }

  test("rfm == driver-side replay of the rank/percentile bin rule on " +
      "random rosters") {
    import TestSpark.spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = (1 to 400).map { _ =>
      val u = rnd.nextInt(40).toLong + 1
      (u, new java.sql.Timestamp(1704067200000L + rnd.nextInt(30) * 86400000L),
        if (rnd.nextInt(3) == 0) "purchase" else "view",
        rnd.nextInt(500) / 10.0)
    }
    val got = graft.ops.Journeys.rfm(
        rows.toDF("user_id", "ts", "event_type", "value"))
      .collect().map(r => r.getLong(0) -> r.getString(7)).toMap
    // sequential replay: per-user metrics, value-level rank, pct, bin
    val perUser = rows.groupBy(_._1).map { case (u, es) =>
      val lastDay = es.map(_._2.getTime / 86400000L).max
      val m = es.collect { case (_, _, "purchase", v) =>
        math.floor(v * 10000).toLong }.sum
      (u, lastDay, es.size.toLong, m)
    }.toSeq
    val maxDay = perUser.map(_._2).max
    val n = perUser.size.toLong
    def bins(vals: Seq[Long]): Map[Long, Long] = {
      val sorted = vals.sorted
      vals.distinct.map { v =>
        val rank = sorted.indexOf(v) + 1L // ties share first position
        val pct = math.floor(10000.0 * (rank - 1) / math.max(1L, n - 1)).toLong
        v -> math.min(4L, (pct * 4) / 10000 + 1)
      }.toMap
    }
    val rB = bins(perUser.map(maxDay - _._2))
    val fB = bins(perUser.map(_._3))
    val mB = bins(perUser.map(_._4))
    val want = perUser.map { case (u, last, f, m) =>
      u -> s"R${rB(maxDay - last)}F${fB(f)}M${mB(m)}"
    }.toMap
    assert(got === want)
  }
}
