package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.io.Layout

class LayoutSpec extends SparkSpec {

  test("partitioned layout: per-project scans prune to one partition") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-layout").toString + "/samples"
    val df = Seq(
      ("s1", "P1", 1.0), ("s2", "P1", 2.0), ("s3", "P2", 3.0), ("s4", "P3", 4.0))
      .toDF("sample_name", "ccgp_project_id", "v")
    Layout.writePartitioned(df, dir)

    val scan = spark.read.parquet(dir).where(col("ccgp_project_id") === "P1")
    assert(scan.count() === 2)
    val plan = scan.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the predicate became a partition filter (pruned scan), not a data filter
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("ccgp_project_id"), plan)
  }

  test("dynamic partition pruning: a dim filter prunes the partitioned fact at runtime") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dpp").toString + "/fact"
    // partitioned fact: 8 partitions, values only in the key column's dir
    val fact = (1 to 800).map(i => (i.toLong, s"P${i % 8}", i * 1.5))
      .toDF("id", "ccgp_project_id", "v")
    Layout.writePartitioned(fact, dir)
    // the dim must be a real source: a local Seq is constant-folded to a
    // LocalRelation, which swallows the Filter node DPP keys off
    val dimDir = Files.createTempDirectory("graft-dpp-dim").toString + "/dim"
    Seq(("P3", "keep"), ("P5", "keep"), ("P6", "drop"))
      .toDF("ccgp_project_id", "tag").write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    // at toy scale the stats-based benefit estimate vetoes DPP (the
    // whole fact is KBs); disable the estimate — at 100 TB the real
    // stats make the same decision this flag forces here
    val statsKey = "spark.sql.optimizer.dynamicPartitionPruning.useStats"
    val prev = spark.conf.get(statsKey)
    spark.conf.set(statsKey, "false")
    try {
      val joined = spark.read.parquet(dir)
        .join(dim.where($"tag" === "keep"), Seq("ccgp_project_id"))
      assert(joined.count() === 200)
      val plan = joined.queryExecution.executedPlan.toString
      // the fact scan's partition filter is a RUNTIME subquery fed by
      // the dim — the 100-TB fact reads 2 of 8 partitions without a
      // static predicate ever being written
      assert(plan.contains("dynamicpruning"), plan)
    } finally spark.conf.set(statsKey, prev)
  }

  test("salted join equals the plain join (inner and left)") {
    import spark.implicits._
    // skewed big side: one hot key
    val big = (1 to 1000).map(i => (if (i % 10 == 0) "cold" + i else "HOT", i))
      .toDF("key", "v")
    val small = Seq(("HOT", "h"), ("cold10", "c10"), ("missing", "m"))
      .toDF("key", "label")
    for (jt <- Seq("inner", "left")) {
      val plain = big.join(small, Seq("key"), jt)
        .select("key", "v", "label").collect().map(_.toString).sorted
      val salted = Layout.saltedJoin(big, small, "key", 8, jt)
        .select("key", "v", "label").collect().map(_.toString).sorted
      assert(plain.sameElements(salted), s"mismatch for $jt")
    }
  }

  test("salted join rejects right/full outer (replicas would surface)") {
    import spark.implicits._
    val big = Seq(("k", 1)).toDF("key", "v")
    val small = Seq(("k", "l"), ("unmatched", "u")).toDF("key", "label")
    for (jt <- Seq("right", "full", "full_outer"))
      assertThrows[IllegalArgumentException](
        Layout.saltedJoin(big, small, "key", 4, jt))
  }

  test("done-marker gate: marker appears only after the write succeeds; log sink writes lines") {
    import graft.io.Sinks
    val dir = Files.createTempDirectory("graft-marker").toString
    val marker = s"$dir/stage_done.txt"
    assert(!Sinks.markerExists(spark, marker))
    // failing write: no marker
    assertThrows[RuntimeException](
      Sinks.withDoneMarker(spark, marker) { throw new RuntimeException("boom") })
    assert(!Sinks.markerExists(spark, marker))
    // succeeding write: marker gates downstream
    Sinks.withDoneMarker(spark, marker) {
      Sinks.writeLog(spark, Seq("Found 2 reads.", "Found 1 samples."), s"$dir/log")
    }
    assert(Sinks.markerExists(spark, marker))
    val lines = spark.read.text(s"$dir/log").collect().map(_.getString(0)).toSet
    assert(lines === Set("Found 2 reads.", "Found 1 samples."))
  }

  test("bucketed tables join and aggregate with zero exchanges") {
    import spark.implicits._
    val orders = Tables.load(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val li = Tables.load(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_quantity")
    Layout.writeBucketed(orders, "b_orders", "o_orderkey", 4)
    Layout.writeBucketed(li.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey", 4)
    try {
      val bo = spark.table("b_orders")
      val bl = spark.table("b_lineitem")
      // force the non-broadcast path (the layout exists for big-big joins)
      val joined = bo.hint("merge").join(bl, "o_orderkey")
        .groupBy($"o_orderkey").agg(sum($"l_quantity").as("qty"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      import org.apache.spark.sql.execution.exchange.Exchange
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: Exchange => e }
      assert(plan.contains("SortMergeJoin"), plan)
      assert(exchanges.isEmpty,
        s"bucketed join+agg must be exchange-free\n$plan")
      // and the answer matches the unbucketed join
      val want = orders.join(
          li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
        .groupBy($"o_orderkey").agg(sum($"l_quantity").as("qty"))
      // rounded: the two plans sum each group in different orders
      def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e6))).toSet
      assert(asSet(joined) === asSet(want))
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  private def withConfs[T](kvs: Seq[(String, String)])(body: => T): T = {
    val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("compactFiles: ceil(bytes/target) output files, shuffle-free plan, content intact") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-compact").toString
    val in = s"$base/in"; val out = s"$base/out"
    val df = (1L to 10000L).map(i => (i, "v" * 50)).toDF("id", "payload")
    df.repartition(64).write.parquet(in)
    val bytes = new java.io.File(in).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.length).sum
    val (nBefore, bytesSeen, nAfter) =
      Layout.compactFiles(spark, in, out, targetBytes = (bytes + 2) / 3)
    assert(nBefore === 64)
    assert(bytesSeen === bytes)
    assert(nAfter === 3, s"expected 3 compacted files, got $nAfter")
    // the compaction frame itself plans with no Exchange (coalesce, not
    // repartition — each output task reads input files end-to-end)
    val plan = spark.read.parquet(in).coalesce(3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // content survives byte-for-byte
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(got.length === 10000 && got.sameElements(
      df.collect().map(r => (r.getLong(0), r.getString(1))).sorted))
  }

  test("AQE splits the hot partition of a skewed sort-merge join at runtime") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "10KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    withConfs(confs) {
      // 90% of the fact lands on key 0 — the canonical hot-key join
      val big = spark.range(0, 40000)
        .select(when($"id" % 10 =!= 0, lit(0L)).otherwise($"id").as("key"),
          concat(lit("p"), $"id".cast("string"), lit("x" * 64)).as("pad"))
      val dim = spark.range(0, 40000).select($"id".as("key"),
        concat(lit("label"), $"id".cast("string")).as("label"))
      // the join must be the terminal shuffle consumer: a groupBy after
      // it REQUIRES hash partitioning, and OptimizeSkewedJoin refuses to
      // break a required distribution (it would force a re-shuffle) —
      // exactly why real pipelines end skew-prone joins before re-keying
      val joined = big.join(dim, "key")
      assert(joined.collect().length === 40000)
      // the runtime plan really split the skewed partition: the final
      // adaptive plan marks the shuffle reads / SMJ as skew-handled
      // (executedPlan.toString stops at the AQE wrapper; explainString
      // renders the final plan once isFinalPlan=true)
      val plan = joined.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
      assert(plan.contains("isFinalPlan=true"), plan)
      assert(plan.toLowerCase.contains("skew"),
        s"no skew-split marker in the adaptive plan:\n$plan")
      // correctness cross-check through the re-keying consumer shape too
      val rows = big.join(dim, "key").groupBy($"key")
        .agg(count(lit(1)).as("n")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(rows(0L) === 36001L)      // 36000 remapped + id 0 itself
      assert(rows.size === 4000)       // key 0 + the 3999 surviving ids
    }
  }

  test("zvalue kernel == naive interleave; aligned prefix blocks nest") {
    import graft.functions.ZOrderKernel
    def naive(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (z, i) =>
        z | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val rnd = new scala.util.Random(11)
    val pts = Seq((0L, 0L), (65535L, 65535L), (0L, 65535L), (1L, 0L)) ++
      (1 to 500).map(_ => (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    pts.foreach { case (x, y) =>
      val z = ZOrderKernel.zvalue(x, y, 16)
      assert(z === naive(x, y, 16), s"($x,$y)")
      // the curve's defining property: truncating 2k z-bits == the
      // z-value of the k-bit-truncated point, so every aligned
      // 2^j x 2^j square is one contiguous z range
      (1 to 16).foreach { k =>
        assert((z >>> (2 * (16 - k))) ===
          ZOrderKernel.zvalue(x >>> (16 - k), y >>> (16 - k), k), s"($x,$y) k=$k")
      }
    }
  }

  test("hilbert kernel: bijective on the grid, consecutive distances are " +
      "ALWAYS grid neighbors (the property Morton lacks), base quadrant order") {
    import graft.functions.HilbertKernel
    // bits=1: the defining U shape (0,0)->(0,1)->(1,1)->(1,0)
    assert(HilbertKernel.xy2d(1, 0L, 0L) === 0L)
    assert(HilbertKernel.xy2d(1, 0L, 1L) === 1L)
    assert(HilbertKernel.xy2d(1, 1L, 1L) === 2L)
    assert(HilbertKernel.xy2d(1, 1L, 0L) === 3L)
    // bits=4: a bijection 16x16 -> [0, 256)
    val d2xy = (for (x <- 0L until 16L; y <- 0L until 16L)
      yield HilbertKernel.xy2d(4, x, y) -> ((x, y))).toMap
    assert(d2xy.size === 256 && d2xy.keys.min === 0L && d2xy.keys.max === 255L)
    // adjacency: every step along the curve moves exactly one grid cell
    (0L until 255L).foreach { d =>
      val (x1, y1) = d2xy(d); val (x2, y2) = d2xy(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1, s"step $d")
    }
    // coordinates above the grid mask down (the ZValue masking contract)
    assert(HilbertKernel.xy2d(4, 16L + 3L, 32L + 7L) ===
      HilbertKernel.xy2d(4, 3L, 7L))
  }

  test("hilbert3 kernel: bijective on the full cube, consecutive distances are " +
      "ALWAYS grid neighbors; masking contract; hilbertBy3 plan shape") {
    import graft.functions.Hilbert3Kernel
    // bits=3: a bijection 8x8x8 -> [0, 512)
    val d2xyz = (for (x <- 0L until 8L; y <- 0L until 8L; z <- 0L until 8L)
      yield Hilbert3Kernel.xyz2d(3, x, y, z) -> ((x, y, z))).toMap
    assert(d2xyz.size === 512 && d2xyz.keys.min === 0L && d2xyz.keys.max === 511L)
    // adjacency: every curve step moves exactly one grid cell (L1 = 1)
    (0L until 511L).foreach { d =>
      val (x1, y1, z1) = d2xyz(d); val (x2, y2, z2) = d2xyz(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) + math.abs(z1 - z2) === 1,
        s"step $d: ($x1,$y1,$z1) -> ($x2,$y2,$z2)")
    }
    // the curve starts at the origin
    assert(Hilbert3Kernel.xyz2d(3, 0L, 0L, 0L) === 0L)
    // coordinates above the grid mask down
    assert(Hilbert3Kernel.xyz2d(3, 8L + 3L, 16L + 5L, 24L + 7L) ===
      Hilbert3Kernel.xyz2d(3, 3L, 5L, 7L))
    // hilbertBy3 plans as one range exchange, like the 2-D form
    import spark.implicits._
    val li = Tables.load(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_partkey", $"l_suppkey")
    val clustered = Layout.hilbertBy3(li,
      "l_orderkey", "l_partkey", "l_suppkey", bits = 10, numFiles = 8)
    val plan = clustered.queryExecution.executedPlan.toString
    assert(plan.split("rangepartitioning").length - 1 +
      plan.split("RangePartitioning").length - 1 >= 1, plan)
    assert(!plan.contains("hashpartitioning"), plan)
  }

  test("zorderBy: one range exchange; output partitions cover compact 2-D boxes") {
    import spark.implicits._
    val li = Tables.load(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_partkey")
    val clustered = Layout.zorderBy(li, "l_orderkey", "l_partkey",
      bits = 16, numFiles = 8)
    val plan = clustered.queryExecution.executedPlan.toString
    assert(plan.split("rangepartitioning").length - 1 +
      plan.split("RangePartitioning").length - 1 >= 1, plan)
    assert(!plan.contains("hashpartitioning"), plan)
    // locality: the average per-partition bounding box is far smaller
    // than the global box (that is what makes footer stats prune)
    val boxes = clustered
      .withColumn("pid", spark_partition_id())
      .withColumn("x", $"l_orderkey".bitwiseAND(65535L))
      .withColumn("y", $"l_partkey".bitwiseAND(65535L))
      .groupBy($"pid")
      .agg(min($"x").as("x0"), max($"x").as("x1"),
        min($"y").as("y0"), max($"y").as("y1"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(boxes.length >= 4)
    val gx0 = boxes.map(_._1).min; val gx1 = boxes.map(_._2).max
    val gy0 = boxes.map(_._3).min; val gy1 = boxes.map(_._4).max
    val global = (gx1 - gx0 + 1).toDouble * (gy1 - gy0 + 1)
    val avg = boxes.map(b => (b._2 - b._1 + 1).toDouble * (b._4 - b._3 + 1))
      .sum / boxes.length
    assert(avg < global / 2, s"avg box $avg vs global $global")
  }

  test("hilbertBy: same plan shape as zorderBy, compact per-partition boxes") {
    import spark.implicits._
    val li = Tables.load(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_partkey")
    val clustered = Layout.hilbertBy(li, "l_orderkey", "l_partkey",
      bits = 16, numFiles = 8)
    val plan = clustered.queryExecution.executedPlan.toString
    assert(plan.split("rangepartitioning").length - 1 +
      plan.split("RangePartitioning").length - 1 >= 1, plan)
    assert(!plan.contains("hashpartitioning"), plan)
    val boxes = clustered
      .withColumn("pid", spark_partition_id())
      .withColumn("x", $"l_orderkey".bitwiseAND(65535L))
      .withColumn("y", $"l_partkey".bitwiseAND(65535L))
      .groupBy($"pid")
      .agg(min($"x").as("x0"), max($"x").as("x1"),
        min($"y").as("y0"), max($"y").as("y1"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(boxes.length >= 4)
    val gx0 = boxes.map(_._1).min; val gx1 = boxes.map(_._2).max
    val gy0 = boxes.map(_._3).min; val gy1 = boxes.map(_._4).max
    val global = (gx1 - gx0 + 1).toDouble * (gy1 - gy0 + 1)
    val avg = boxes.map(b => (b._2 - b._1 + 1).toDouble * (b._4 - b._3 + 1))
      .sum / boxes.length
    assert(avg < global / 2, s"avg box $avg vs global $global")
  }
}
