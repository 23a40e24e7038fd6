package graft

import graft.ext.Frequency
import org.apache.spark.sql.functions._

/** Heavy-hitter goldens: the pigeonhole candidate guarantee under
  * adversarial partitioning, exactness of the verify phase, and null
  * handling — properties the relational oracle can't isolate. */
class FrequencySpec extends SparkSpec {

  import spark.implicits._

  test("heavy hitters equal the naive groupBy under worst-case key spreading") {
    // a key with global count exactly T, spread one-occurrence-per-
    // partition across 32 partitions: the local threshold drops to
    // ceil(T/32) = 1, so every partition nominates it — the pigeonhole
    // superset must hold even when no partition sees it twice
    val thin = spark.range(32).select(lit("thin").as("k"))
      .repartition(32)
    val rnd = new scala.util.Random(11)
    val noise = (1 to 2000).map(_ => s"w${rnd.nextInt(300)}").toDF("k")
    val df = thin.unionByName(noise).repartition(32)
    val got = Frequency.heavyHitters(df, "k", 32L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = df.groupBy($"k").agg(count(lit(1)).as("cnt"))
      .where($"cnt" >= 32).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(got.contains("thin") && got("thin") === 32L)
  }

  test("false candidates die in the verify phase; threshold is inclusive") {
    // one partition holds 40 copies of "local" (a local heavy hitter)
    // but globally it stays below T=45 — it must be verified away
    val local = spark.range(40).select(lit("local").as("k")).coalesce(1)
    val heavy = spark.range(45).select(lit("heavy").as("k"))
    val out = Frequency.heavyHitters(local.unionByName(heavy), "k", 45L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("heavy" -> 45L))
  }

  test("distinctHeavyGroups equals the naive distinct-count HAVING") {
    val rnd = new scala.util.Random(5L)
    // 40 groups, skewed distinct cardinalities around the threshold
    val rows = (1 to 8000).map { _ =>
      val g = rnd.nextInt(40).toLong
      (g, rnd.nextInt(20 + 3 * g.toInt).toLong)
    }.toDF("g", "v")
    val got = Frequency.distinctHeavyGroups(rows, "g", "v", 50L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = rows.groupBy($"g").agg(countDistinct($"v").as("d"))
      .where($"d" >= 50).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(want.nonEmpty && want.size < 40) // both outcomes exercised
  }

  test("exactQuantiles equals the sorted-multiset definition, dups and all") {
    // duplicated values around every cut: the discrete quantile must be
    // an ELEMENT of the multiset at position ceil(p*n) — a formulation
    // bug (e.g. counting distinct values) shifts it
    val rnd = new scala.util.Random(7)
    val rows = (1 to 5000).map { _ =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(40).toDouble / 4.0)
    }.toDF("g", "v")
    val got = Frequency.exactQuantiles(rows, "g", "v", Seq(0.5, 0.9, 0.99))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val want = rows.collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (g, a) =>
        val sorted = a.map(_._2).sorted
        def q(p: Double) = sorted(math.ceil(p * sorted.length).toInt - 1)
        g -> (q(0.5), q(0.9), q(0.99))
      }
    assert(got === want)
  }

  test("exactQuantiles: groups spanning many range partitions carry the prefix sum across") {
    // one giant group over 4 shuffle partitions (local[4] test session):
    // the per-partition offsets must stitch into one global cumulative
    // count or the selected element comes from the wrong slice
    val one = spark.range(10000).select(lit("big").as("g"),
      ($"id" % 997).cast("double").as("v"))
    val tiny = Seq(("small", 42.0)).toDF("g", "v")
    val got = Frequency.exactQuantiles(one.unionByName(tiny), "g", "v", Seq(0.25, 1.0))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val sorted = one.collect().map(_.getDouble(1)).sorted
    assert(got("big") === (sorted(math.ceil(0.25 * 10000).toInt - 1), sorted.last))
    assert(got("small") === ((42.0, 42.0))) // p<=1 of a singleton is itself
  }

  test("exactQuantiles excludes null groups and null values") {
    val rows = Seq[(String, java.lang.Double)](
      ("a", 1.0), ("a", 2.0), ("a", null), (null, 9.0), ("a", 3.0))
      .toDF("g", "v")
    val got = Frequency.exactQuantiles(rows, "g", "v", Seq(0.5)).collect()
    assert(got.length === 1)
    assert(got.head.getString(0) === "a" && got.head.getDouble(1) === 2.0)
  }

  test("null keys are excluded; typed key column survives to the output") {
    val df = spark.range(100).select(
      when($"id" % 10 === 0, lit(null)).otherwise($"id" % 3).as("k"))
    val out = Frequency.heavyHitters(df, "k", 25L)
    assert(out.schema("k").dataType.typeName === "long")
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ids 1..99 minus multiples of 10: k=id%3 — exact counts per residue
    val want = (0L until 100L).filter(_ % 10 != 0).groupBy(_ % 3)
      .view.mapValues(_.size.toLong).filter(_._2 >= 25).toMap
    assert(got === want)
  }

  test("count-min sketch: one-sided bound holds; wide sketch is exact; sketches merge") {
    val rnd = new scala.util.Random(17)
    val keys = (1 to 3000).map(_ => s"k${rnd.nextInt(40)}").toDF("k")
    val truth = keys.groupBy($"k").agg(count(lit(1)).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // narrow sketch (width 16 << 40 keys): collisions certain, est >= true
    val narrow = Frequency.countMinSketch(keys, "k", depth = 4, width = 16)
    val estN = Frequency.cmsEstimate(narrow, keys, "k", depth = 4, width = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, t) =>
      assert(estN(k) >= t, s"$k: est ${estN(k)} < true $t")
    }
    assert(truth.exists { case (k, t) => estN(k) > t }) // collisions happened
    // wide sketch: 4096 cells for 40 keys -> exact with high probability
    val wide = Frequency.countMinSketch(keys, "k", depth = 4, width = 4096)
    val estW = Frequency.cmsEstimate(wide, keys, "k", depth = 4, width = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estW === truth)
    // mergeability: sketch(A) union sketch(B), re-aggregated = sketch(A++B)
    val (a, b) = (keys.limit(1500), keys.exceptAll(keys.limit(1500)))
    val merged = Frequency.countMinSketch(a, "k", 4, 16)
      .unionByName(Frequency.countMinSketch(b, "k", 4, 16))
      .groupBy($"j", $"c").agg(sum($"cnt").as("cnt"))
    val estM = Frequency.cmsEstimate(merged, keys, "k", 4, 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estM === estN)
  }

  test("exactQuantilesCont: interpolation, boundaries, ties, n=1 — hand-computed") {
    // group a: sorted 10, 20, 30, 40 (n=4): p50 → h=1.5 → 20 + 0.5·10 = 25
    //   p25 → h=0.75 → 10 + 0.75·10 = 17.5 ; p0 → min ; p100 → max
    val a = Seq(40L, 10L, 30L, 20L).map(("a", _))
    val b = Seq(7L) // n=1: every percentile is the value
    val df = (a ++ b.map(("b", _))).toDF("g", "v")
    val out = Frequency.exactQuantilesCont(df, "g", "v",
        Seq(0.0, 0.25, 0.5, 1.0))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out("a") === ((10.0, 17.5, 25.0, 40.0)))
    assert(out("b") === ((7.0, 7.0, 7.0, 7.0)))
    // duplicated values interpolate across equal order statistics
    val ties = Seq(1L, 2L, 2L, 3L).map(("t", _)).toDF("g", "v")
    val p50 = Frequency.exactQuantilesCont(ties, "g", "v", Seq(0.5)).head.getDouble(1)
    assert(p50 === 2.0) // h=1.5: v2=2, v3=2
  }

  test("globalRank: rank()-with-ties semantics, no single-partition exchange, no Window") {
    val vals = Seq(5L, 3L, 3L, 9L, 1L, 9L, 9L, 2L).toDF("v")
    val out = Frequency.globalRank(vals, "v")
    val got = out.collect()
      .map(r => r.getDouble(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // sorted: 1 2 3 3 5 9 9 9 -> rank of ties = smallest position
    assert(got === Map(1.0 -> ((1L, 1L)), 2.0 -> ((1L, 2L)),
      3.0 -> ((2L, 3L)), 5.0 -> ((1L, 5L)), 9.0 -> ((3L, 6L))))
    val pct = out.collect().map(r => r.getDouble(0) -> r.getLong(3)).toMap
    assert(pct(1.0) === 0L && pct(9.0) === math.floor(10000.0 * 5 / 7).toLong)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("gridQuantileSketch: true <= est <= true + width on random data; sketches merge") {
    val rnd = new scala.util.Random(37)
    val xs = (1 to 500).map(_ => rnd.nextDouble() * 100.0)
    val df = xs.toDF("v")
    val w = 4.0
    val ps = Seq(0.5, 0.9, 0.99)
    val est = Frequency.gridQuantileEstimate(
      Frequency.gridQuantileSketch(df, "v", w), w, ps).head
    val sorted = xs.sorted
    ps.zipWithIndex.foreach { case (p, i) =>
      val truth = sorted(math.ceil(p * xs.size).toInt - 1)
      val e = est.getDouble(i)
      assert(e >= truth && e <= truth + w, s"p=$p est=$e true=$truth")
    }
    // merge law: sketch(A ++ B) == re-aggregate(sketch(A) union sketch(B))
    val (a, b) = xs.splitAt(200)
    val merged = Frequency.gridQuantileSketch(a.toDF("v"), "v", w)
      .unionByName(Frequency.gridQuantileSketch(b.toDF("v"), "v", w))
      .groupBy($"b").agg(sum($"cnt").as("cnt"))
    val whole = Frequency.gridQuantileSketch(df, "v", w)
    assert(merged.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ===
      whole.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
  }

  test("cmsJoinSize: one-sided bound always, exact when the sketch out-widths the keys") {
    val a = (1 to 100).map(i => s"k${i % 10}").toDF("k")   // 10 keys x 10
    val b = (1 to 30).map(i => s"k${i % 3}").toDF("k")     // keys k0..k2 x 10
    val truth = a.join(b, Seq("k")).count()                // 3 x 10 x 10 = 300
    assert(truth === 300L)
    // narrow sketch: collisions force est >= true
    val estNarrow = Frequency.cmsJoinSize(
      Frequency.countMinSketch(a, "k", 4, 4),
      Frequency.countMinSketch(b, "k", 4, 4)).head.getLong(0)
    assert(estNarrow >= truth)
    // wide sketch: 512 cells for 10 keys -> near-certainly collision-free
    val estWide = Frequency.cmsJoinSize(
      Frequency.countMinSketch(a, "k", 4, 512),
      Frequency.countMinSketch(b, "k", 4, 512)).head.getLong(0)
    assert(estWide === truth)
  }

  test("equiDepthHistogram: quantile_disc boundaries, ties stay low, k=2 hand case") {
    // 1..10, k=2: boundary = quantile_disc(0.5) = 5 -> buckets of 5 and 5
    val out = Frequency.equiDepthHistogram(
        (1L to 10L).toDF("v"), "v", k = 2)
      .collect().map(r => r.getInt(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(out === Map(1 -> ((1.0, 5.0, 5L)), 2 -> ((6.0, 10.0, 5L))))
  }

  test("equiDepthHistogram: heavy ties overfill the low bucket; empty buckets absent") {
    // eight 1s and two 9s, k=4: boundaries (p25,p50,p75) = (1,1,1) ->
    // every 1 lands in bucket 1, the 9s skip to bucket 4; 2 and 3 empty
    val df = (Seq.fill(8)(1L) ++ Seq(9L, 9L)).toDF("v")
    val out = Frequency.equiDepthHistogram(df, "v", k = 4)
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(out === Map(1 -> 8L, 4 -> 2L))
  }

  test("equiDepthHistogram: null values drop; empty input yields an empty frame") {
    val df = Seq(Some(4L), None, Some(8L)).toDF("v")
    val out = Frequency.equiDepthHistogram(df, "v", k = 2)
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(out === Map(1 -> 1L, 2 -> 1L))
    val empty = Frequency.equiDepthHistogram(
      Seq.empty[Option[Long]].toDF("v"), "v", k = 3)
    assert(empty.columns.toSeq === Seq("bucket", "lo", "hi", "n_rows"))
    assert(empty.count() === 0L)
  }

  test("ksDrift == naive driver-side KS on seeded random samples") {
    val rnd = new scala.util.Random(1234)
    val rows = (1 to 2000).map { _ =>
      val g = s"g${rnd.nextInt(4)}"
      // shifted distributions per sample so D is non-trivial
      val first = rnd.nextBoolean()
      val v = (if (first) rnd.nextInt(100) else rnd.nextInt(100) + rnd.nextInt(30)).toLong
      (g, v, first)
    }
    val out = Frequency.ksDrift(rows.toDF("g", "v", "first"), "g", "v", col("first"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
      val s1 = rs.filter(_._3).map(_._2)
      val s2 = rs.filterNot(_._3).map(_._2)
      if (s1.isEmpty || s2.isEmpty) None
      else {
        val grid = (s1 ++ s2).distinct.sorted
        val dmax = grid.map { v =>
          math.abs(s1.count(_ <= v).toLong * s2.size - s2.count(_ <= v).toLong * s1.size)
        }.max
        Some(g -> (10000L * dmax / (s1.size.toLong * s2.size)))
      }
    }
    assert(out === want)
  }

  test("ksDrift: identical samples 0, disjoint near 10000, hand case exact, one-sample groups drop") {
    val rows =
      // identical distributions -> D = 0
      (1 to 50).flatMap(v => Seq(("same", v.toLong, true), ("same", v.toLong, false))) ++
      // disjoint supports -> D = 1 -> 10000 bp
      (1 to 20).map(v => ("apart", v.toLong, true)) ++
      (21 to 40).map(v => ("apart", v.toLong, false)) ++
      // hand case: s1 = {1,2,3,4}, s2 = {3,4,5,6}:
      //   at v=2: |2*4 - 0*4| = 8 -> D = 8/16 = 5000 bp
      (1 to 4).map(v => ("hand", v.toLong, true)) ++
      (3 to 6).map(v => ("hand", v.toLong, false)) ++
      // only one sample present -> dropped
      (1 to 5).map(v => ("solo", v.toLong, true))
    val df = rows.toDF("g", "v", "first")
    val out = Frequency.ksDrift(df, "g", "v", col("first"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("same") === ((50L, 50L, 0L)))
    assert(out("apart") === ((20L, 20L, 10000L)))
    assert(out("hand") === ((4L, 4L, 5000L)))
    assert(!out.contains("solo"))
  }

  test("skewReport: hand-computed Gini, uniform keys score 0, naive parity") {
    import spark.implicits._
    // counts ascending [1, 1, 2]: n=3, S=4, Σ i·cᵢ = 1+2+6 = 9
    // gini = (2·9 − 4·4)/(3·4) = 2/12 → 1666 bp; top share 2/4 → 5000
    val rows = Seq("a", "b", "c", "c").map(Tuple1(_)).toDF("k")
    val r = Frequency.skewReport(rows, "k").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((3L, 4L, 2L, 5000L, 1666L)))
    // perfectly uniform distribution → gini exactly 0
    val even = (1 to 8).flatMap(i => Seq.fill(5)(s"k$i")).map(Tuple1(_))
      .toDF("k")
    assert(Frequency.skewReport(even, "k").collect().head.getLong(4) === 0L)
    // randomized naive parity: gini from explicitly materialized ranks
    val counts = Seq(7L, 1L, 1L, 3L, 5L, 1L, 2L)
    val df = counts.zipWithIndex
      .flatMap { case (c, i) => Seq.fill(c.toInt)(s"key$i") }
      .map(Tuple1(_)).toDF("k")
    val got = Frequency.skewReport(df, "k").collect().head.getLong(4)
    val sorted = counts.sorted
    val n = sorted.size.toLong
    val s = sorted.sum
    val g2 = sorted.zipWithIndex.map { case (c, i) => (i + 1) * c }.sum
    val want = 10000L * (2 * g2 - (n + 1) * s) / (n * s)
    assert(got === want)
  }

  test("quantileNormalize: hand golden on two 2-row groups") {
    import spark.implicits._
    // pooled sorted = [1, 2, 50, 100]; per group n=2: r=1 → idx 1 → 1,
    // r=2 → idx 3 → 50 — both groups land on the multiset {1, 50}
    val df = Seq(("a", 1L, 1L), ("a", 100L, 2L), ("b", 2L, 3L), ("b", 50L, 4L))
      .toDF("g", "v", "id")
    val got = Frequency.quantileNormalize(df, "g", "v", "id")
      .collect().map(r => (r.getLong(0), r.getLong(2).toDouble ->
        r.getAs[Double]("norm_v"))).toMap
    assert(got === Map(
      1L -> (1.0 -> 1.0), 2L -> (100.0 -> 50.0),
      3L -> (2.0 -> 1.0), 4L -> (50.0 -> 50.0)))
  }

  test("quantileNormalize: equal-size groups share one normalized multiset") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = for (g <- Seq("x", "y", "z"); i <- 1 to 40) yield
      (g, rnd.nextInt(1000).toLong, (g.hashCode.toLong << 8) + i)
    val out = Frequency.quantileNormalize(rows.toDF("g", "v", "id"), "g", "v", "id")
      .collect().map(r => r.getString(1) -> r.getAs[Double]("norm_v"))
      .groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2).sorted.toSeq }
    assert(out("x") === out("y") && out("y") === out("z"))
    // normalized values are drawn from the pooled value set
    val pooled = rows.map(_._2.toDouble).toSet
    assert(out("x").forall(pooled.contains))
  }

  test("PAV isotonic: hand-computed pooling, decreasing input collapses to one " +
      "block, monotone output guaranteed; end-to-end bucket calibration") {
    import graft.functions.PavKernel
    // rates [.1, .3, .2, .5]: the middle violation pools to (5/20)
    assert(PavKernel.isotonicBp(Array(1L, 3L, 2L, 5L),
      Array(10L, 10L, 10L, 10L)).toSeq === Seq(1000L, 2500L, 2500L, 5000L))
    // strictly decreasing -> one pooled block at the global rate
    assert(PavKernel.isotonicBp(Array(5L, 3L, 1L),
      Array(10L, 10L, 10L)).toSeq === Seq(3000L, 3000L, 3000L))
    // already monotone -> untouched
    assert(PavKernel.isotonicBp(Array(0L, 5L, 9L),
      Array(10L, 10L, 10L)).toSeq === Seq(0L, 5000L, 9000L))
    // randomized: output is always non-decreasing
    val rnd = new scala.util.Random(7)
    val ns = Array.fill(40)(rnd.nextInt(50).toLong + 1L)
    val ks = ns.map(n => rnd.nextInt(n.toInt + 1).toLong)
    val iso = PavKernel.isotonicBp(ks, ns)
    assert(iso.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    // end-to-end: scored rows -> buckets -> monotone curve
    import spark.implicits._
    val scored = Seq.tabulate(400) { i =>
      val score = (i % 40) * 250L
      (score, if ((i % 40) * 25 + (i % 7) * 100 > 500) 1L else 0L)
    }.toDF("score_bp", "y")
    val out = Frequency.isotonicCalibrate(scored, "score_bp", "y")
      .orderBy("bucket").collect().map(_.getLong(4))
    assert(out.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
  }

  test("kmvJaccard: sketch holding the whole vocabulary is EXACT; disjoint " +
      "sources score 0; bounded and deterministic at small k") {
    import spark.implicits._
    val docs = Seq(
      ("A", "a b c d"), ("B", "c d e f"), ("C", "zz1 zz2")
    ).toDF("source", "text")
    val out = Frequency.kmvJaccard(docs, k = 64).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(4), r.getLong(5)))).toMap
    // k >= |union| -> the union sketch IS the union: estimate == exact
    assert(out(("A", "B")) === ((3333L, 3333L))) // 2 shared of 6
    assert(out(("A", "C")) === ((0L, 0L)))
    assert(out(("B", "C")) === ((0L, 0L)))
    // small k: still bounded, deterministic across reruns
    val k2a = Frequency.kmvJaccard(docs, k = 2).collect()
      .map(r => r.toSeq).sortBy(_.toString)
    val k2b = Frequency.kmvJaccard(docs, k = 2).collect()
      .map(r => r.toSeq).sortBy(_.toString)
    assert(k2a === k2b)
    assert(k2a.forall { s =>
      val est = s(4).asInstanceOf[Long]; est >= 0L && est <= 10000L })
  }

  test("hllCardinality: rank CASE golden values; estimate within HLL error " +
      "bounds; union row dominates every source") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    // the rank CASE is the leftmost-1-bit position (33 for zero)
    val rc = spark.range(1).select(
      org.apache.spark.sql.functions.expr(Frequency.hllRankCase(
        (1L << 31).toString)).as("a"),
      org.apache.spark.sql.functions.expr(Frequency.hllRankCase("1")).as("b"),
      org.apache.spark.sql.functions.expr(Frequency.hllRankCase("0")).as("c"),
      org.apache.spark.sql.functions.expr(Frequency.hllRankCase(
        ((1L << 20) + 5L).toString)).as("d")).collect().head
    assert(rc.getInt(0) === 1)   // MSB set
    assert(rc.getInt(1) === 32)  // only LSB set
    assert(rc.getInt(2) === 33)  // zero slice
    assert(rc.getInt(3) === 12)  // leftmost 1 at bit 20 -> rank 32-20=12
    // three sources with distinct vocab sizes; words via numbered tokens
    val docs = (0 until 300).map { i =>
      val src = s"s${i % 3}"
      val words = (0 until (i % 3 + 1) * 4)
        .map(j => s"w_${src}_${(i * 7 + j) % ((i % 3 + 1) * 400)}")
      (i.toLong, words.mkString(" "), src)
    }.toDF("doc_id", "text", "source")
    val out = Frequency.hllCardinality(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // small-range linear counting is near-exact below m; raw HLL is
    // 6.5% (1 sigma) above it — 10% covers both regimes here
    out.foreach { case (src, (exact, est, errBp)) =>
      assert(math.abs(est - exact).toDouble / exact <= 0.10,
        s"$src: exact=$exact est=$est")
      // sign-before-division definition (truncated absolute error)
      val want = if (est >= exact) (10000L * (est - exact)) / exact
        else -((10000L * (exact - est)) / exact)
      assert(errBp === want)
    }
    // union register-max dominates every per-source estimate and its
    // exact count is the global distinct
    val union = out("__union")
    Seq("s0", "s1", "s2").foreach { s =>
      assert(union._2 >= out(s)._2 * 9 / 10, s"union vs $s") }
    assert(union._1 >= Seq("s0", "s1", "s2").map(out(_)._1).max)
    // deterministic across reruns
    val again = Frequency.hllCardinality(docs).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(again === out.map { case (k, v) => k -> v._2 })
  }

  test("mutualInfo: null categories are their own level — identical to an " +
      "explicit sentinel level, and their cells reach the MI numerator") {
    // lang null for some rows, correlated with source: pre-fix the
    // null-keyed CELLS dropped out of the MI sum (plain equi-join)
    // while the entropies kept them — MI/NMI inconsistent
    val rows = Seq(
      (Option("en"), "s1"), (Option("en"), "s1"), (Option("en"), "s2"),
      (Option.empty[String], "s3"), (Option.empty[String], "s3"),
      (Option.empty[String], "s1"), (Option("de"), "s2"))
    val withNull = rows.toDF("lang", "source")
    val withSentinel = rows.map { case (a, b) => (a.getOrElse("__null__"), b) }
      .toDF("lang", "source")
    val got = Frequency.mutualInfo(withNull, "lang", "source").collect().head
    val want = Frequency.mutualInfo(withSentinel, "lang", "source").collect().head
    assert(got === want)
    // the null level carries real signal here: a run that dropped its
    // cells would undercount MI (this pins the numerator contribution)
    assert(got.getAs[Long]("mi_q6") > 0L)
  }

  test("cohenKappa: hand-computed golden with a null level; perfect inversion " +
      "is -10000; chance-only table is 0") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    def k(rows: Seq[(Option[String], Option[String])]) =
      Frequency.cohenKappa(rows.toDF("a", "b"), "a", "b").collect().head
    // n=7, agree=4; ra=(x:3,y:2,null:2), cb=(x:4,y:2,null:1), S=18
    // kappa = (7*4-18)/(49-18) = 10/31 -> 3225 bp (floor)
    val g = k(Seq(
      (Some("x"), Some("x")), (Some("x"), Some("x")), (Some("x"), Some("y")),
      (Some("y"), Some("y")), (Some("y"), Some("x")),
      (None, None), (None, Some("x"))))
    assert((g.getAs[Long]("n"), g.getAs[Long]("n_agree"),
      g.getAs[Long]("s_chance"), g.getAs[Long]("kappa_bp")) ===
      ((7L, 4L, 18L, 3225L)))
    // perfect disagreement on a symmetric 2x2: kappa = -1
    val inv = k(Seq((Some("x"), Some("y")), (Some("y"), Some("x"))))
    assert(inv.getAs[Long]("kappa_bp") === -10000L)
    // one-level annotator: chance explains everything -> 0 by contract
    val const = k(Seq((Some("x"), Some("x")), (Some("x"), Some("x"))))
    assert(const.getAs[Long]("kappa_bp") === 0L)
  }
}
