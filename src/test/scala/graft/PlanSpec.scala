package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries._

/** Physical-plan audits (the 100 TB contract): filters/projections reach
  * the parquet scan, dimensions broadcast, global top-k avoids a full
  * sort, aggregations are map-side partial. A plan regression here is a
  * scale bug even when results stay correct. */
class PlanSpec extends SparkSpec {

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("s5 scan: predicate and projection pushed into the parquet scan") {
    val plan = FilterQueries.scanFilterProject(spark, sfDir)
      .queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters:") &&
      plan.contains("GreaterThanOrEqual(l_shipdate"), plan)
    // only the 4 selected columns are read
    assert(plan.contains("ReadSchema") && !plan.contains("l_extendedprice"), plan)
  }

  test("j1/j2 dimension lookups are broadcast joins (no shuffle of the fact side)") {
    assert(planOf(JoinQueries.twoTierLookup(spark, sfDir)).contains("BroadcastHashJoin"))
    assert(planOf(JoinQueries.dimLookup(spark, sfDir)).contains("BroadcastHashJoin"))
  }

  test("a14 star join: every dimension hop broadcasts; fact side joins hash-wise") {
    val plan = planOf(AggQueries.starRevenue(spark, sfDir))
    // three dimension hops (customer, nation, region) broadcast
    assert(plan.split("BroadcastHashJoin").length - 1 >= 3, plan)
    // the pushed filters prune dims/orders before any join
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    // the year filter is applied (pruning orders before its fact join)
    assert(plan.contains("year"), plan)
  }

  test("j3 substring linkage is a broadcast nested-loop over the tiny side only") {
    val plan = planOf(JoinQueries.substringLinkage(spark, sfDir))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("o1 global top-k plans as TakeOrderedAndProject (no full sort shuffle)") {
    val plan = planOf(SortSetQueries.topOrders(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("o5 keyset page stays TakeOrderedAndProject with the anchor pushed to the scan") {
    val plan = planOf(SortSetQueries.keysetPage(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // the row-value anchor decomposes into conjuncts that reach the
    // parquet scan as pushed filters (at minimum the date range)
    assert(plan.contains("PushedFilters") && plan.contains("o_orderdate"), plan)
  }

  test("a1 aggregations are map-side partial (two HashAggregate phases)") {
    val plan = planOf(AggQueries.conditionalAgg(spark, sfDir))
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("cleaning functions stay narrow: no Exchange in a pure select") {
    val df = Tables.load(spark, sfDir, "documents")
      .select(graft.functions.CleaningFunctions.normalizeName(col("text")),
        graft.functions.CleaningFunctions.checkDate(col("lang")))
    assert(!planOf(df).contains("Exchange"))
  }

  test("IVF index build is narrow: corpus cell assignment has no Exchange, probe side broadcasts") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val cents = graft.ext.Similarity.ivfCentroids(emb, 16)
    // the corpus-side plan a probe join consumes: scan + argmax projection
    val assigned = emb.select(col("vec_id"),
      graft.ext.Similarity.ivfCell(col("embedding"), cents).as("cell"))
    assert(!planOf(assigned).contains("Exchange"), planOf(assigned))
    // full operator: the only Exchange is the final top-k window over
    // candidates; the corpus reaches the probe join via BroadcastHashJoin
    val full = graft.ext.Similarity.ivfTopK(emb.where(col("vec_id") < 10), emb, 5)
    val plan = planOf(full)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("winnowing fingerprints stay narrow: per-row HOFs, no Exchange before the explode") {
    val df = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        graft.ext.TextStats.winnowFingerprints(col("text")).as("fps"))
    assert(!planOf(df).contains("Exchange"), planOf(df))
  }

  test("sampling/split decisions are narrow: no Exchange before the sink") {
    val docs = Tables.load(spark, sfDir, "documents")
    val sampled = graft.ext.Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 500), defaultBp = 1000)
    assert(!planOf(sampled).contains("Exchange"), planOf(sampled))
    val split = docs.select(graft.ext.Sampling.splitAssign(col("doc_id"),
      Seq(("train", 9000), ("test", 1000))))
    assert(!planOf(split).contains("Exchange"), planOf(split))
  }

  test("mixture sampling is narrow after the bounded rate derivation") {
    val docs = Tables.load(spark, sfDir, "documents")
    val rates = graft.ext.Sampling.mixtureRates(docs, "source")
    val kept = graft.ext.Sampling.stratifiedSample(docs, "doc_id", "source",
      rates, defaultBp = 0)
    // the per-row filter itself is an inlined-rate scan — zero shuffle
    assert(!planOf(kept).contains("Exchange"), planOf(kept))
  }

  test("shard assignment: exactly one hash Exchange (the per-shard window), no sort shuffle") {
    val docs = Tables.load(spark, sfDir, "documents")
    val plan = planOf(graft.ext.Sampling.shardAssign(docs, "doc_id", 8))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan)
    assert(!plan.contains("Exchange rangepartitioning"), plan)
  }

  test("vocab pairs: global top-k is TakeOrderedAndProject over a partial aggregate") {
    val docs = Tables.load(spark, sfDir, "documents")
    val plan = planOf(graft.ext.TextStats.vocabPairs(docs, 50))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("semantic dedup cell assignment is narrow; pair join is hash-equi on the cell") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val cents = graft.ext.Similarity.ivfCentroids(emb, 4)
    val assigned = emb.select(col("vec_id"),
      graft.ext.Similarity.ivfCell(col("embedding"), cents).as("cell"))
    assert(!planOf(assigned).contains("Exchange"), planOf(assigned))
    // full operator: within-cell pairing must never plan as a nested
    // loop / cartesian — cells are an equi key
    val full = graft.ext.CacheScope.withCacheScope { _ =>
      graft.ext.Dedup.semanticDedup(emb, nCells = 4, threshold = 0.3,
        centroids = Some(cents))
    }
    val plan = planOf(full)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("lm score: counts are map-side partial; corpus side joins the gram table once") {
    val docs = Tables.load(spark, sfDir, "documents")
    val plan = planOf(graft.ext.TextStats.lmScore(docs))
    assert("HashAggregate".r.findAllIn(plan).size >= 4, plan) // 2 counts x partial+final
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("exact dedup is one shuffle: a single Exchange on the digest, no join") {
    val docs = Tables.load(spark, sfDir, "documents")
    val plan = planOf(graft.ext.Dedup.exact(docs))
    assert("Exchange".r.findAllIn(plan).size === 1, plan)
    assert(!plan.contains("Join"), plan)
  }

  test("decontamination: the probe (eval-set) side reaches the fingerprint join as a broadcast") {
    val docs = Tables.load(spark, sfDir, "documents")
    val plan = planOf(graft.ext.Contamination.overlaps(
      docs, docs.where(col("doc_id") % 101 === 0), minShared = 3))
    // an eval set is always small next to the corpus — shuffling the
    // corpus on fp to meet it would be the 100 TB mistake
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("custom expressions run inside whole-stage codegen") {
    val df = Tables.load(spark, sfDir, "documents")
      .select(graft.functions.CustomExpressions.fuzz_ratio(col("text"), col("lang")),
        graft.functions.CustomExpressions.dms_to_decimal(col("text")))
    // '*(n)' prefixes mark operators fused into WholeStageCodegen stage n
    val plan = planOf(df)
    assert(plan.contains("*(1) Project") && plan.contains("fuzz_ratio"), plan)
  }

  test("scalable linkage equi path is a hash join, not a nested loop") {
    val samples = Fixtures.samples(spark)
    val reads = Fixtures.reads(spark)
    val probes = graft.ops.Linkage.candidateKeys(samples)
      .withColumn("norm_key", graft.ops.Linkage.normKey(col("key")))
    val fileKeys = graft.ops.Linkage.fileSubstringKeys(reads)
    val equi = fileKeys.join(probes, col("file_key") === col("norm_key"))
    assert(planOf(equi).contains("HashJoin") && !planOf(equi).contains("NestedLoop"))
  }

  test("corrOls is ONE shuffle: a single hash exchange on the group key") {
    import spark.implicits._
    val df = Seq(("a", 1L, 2L), ("a", 2L, 4L), ("b", 1L, 1L))
      .toDF("g", "x", "y")
    val plan = planOf(graft.ops.Moments.corrOls(df, "g", "x", "y"))
    assert(plan.split("Exchange").length - 1 === 1, plan)
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("mixKlDrift: term join shuffles, source/corpus totals broadcast") {
    val docs = Tables.load(spark, sfDir, "documents")
    val plan = planOf(graft.ext.TextStats.mixKlDrift(docs))
    // srcTot (source-cardinality) and globTot (1 row) ride broadcasts
    assert(plan.split("BroadcastHashJoin").length - 1 >= 1, plan)
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.split("BroadcastHashJoin").length - 1 >= 2, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q6 scan-aggregate: every predicate pushes into the parquet reader") {
    val plan = TpchQueries.q6(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters:"), plan)
    assert(plan.contains("GreaterThanOrEqual(l_shipdate") ||
      plan.contains("LessThan(l_shipdate"), plan)
    assert(plan.contains("LessThan(l_quantity"), plan)
    // only the columns the aggregate needs are read
    assert(!plan.contains("l_orderkey"), plan)
  }

  test("skipgrams: top-k is TakeOrderedAndProject over a partial-combined pair count") {
    val plan = planOf(graft.ext.TextStats.skipgrams(
      Tables.load(spark, sfDir, "documents"), window = 3, k = 20))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan) // partial + final
    assert(!plan.contains("Sort "), plan) // never a global sort
  }

  test("boilerplateFilter: the hot set broadcasts; occurrences anti-join in place") {
    val df = graft.ext.Dedup.boilerplateFilter(
      Tables.load(spark, sfDir, "documents"), segLen = 8, minDf = 3)
    df.count() // AQE finalizes the join strategy
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
    spark.catalog.clearCache()
  }

  test("rollingActives: pure aggregates - no Window, dedupe below the explode") {
    val plan = planOf(graft.ops.Journeys.rollingActives(
      Tables.load(spark, sfDir, "events"), windowDays = 7))
    assert(!plan.contains("Window"), plan)
    // the (user, day) dedupe aggregate feeds the Generate (explode), so
    // the window expansion runs over the DEDUPED frame, not raw events
    assert(plan.indexOf("Generate explode") >= 0, plan)
    assert(plan.indexOf("HashAggregate", plan.indexOf("Generate explode")) >= 0, plan)
  }

  test("productQuantize is fully narrow: no exchange in the assignment scan") {
    val plan = planOf(graft.ext.Similarity.productQuantize(
      Tables.load(spark, sfDir, "embeddings")))
    assert(!plan.contains("Exchange"), plan)
  }

  test("q1 pricing summary: partial aggregation, shipdate pushed, columns pruned") {
    val plan = TpchQueries.q1(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // two HashAggregate phases: all eight aggregates combine map-side
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("LessThanOrEqual(l_shipdate"), plan)
    // the join keys the query never touches must not be read
    assert(!plan.contains("l_orderkey"), plan)
    assert(!plan.contains("l_partkey"), plan)
  }

  test("q3/q18: selective dims broadcast, global top-k is TakeOrderedAndProject") {
    val p3 = planOf(TpchQueries.q3(spark, sfDir))
    assert(p3.contains("BroadcastHashJoin"), p3)
    assert(p3.contains("TakeOrderedAndProject"), p3)
    val p18 = planOf(TpchQueries.q18(spark, sfDir))
    assert(p18.contains("TakeOrderedAndProject"), p18)
    assert(p18.contains("BroadcastHashJoin"), p18)
  }

  test("q5/q10: six-way join tree stays equi (no product), tiny dims broadcast") {
    val p5 = planOf(TpchQueries.q5(spark, sfDir))
    assert(!p5.contains("CartesianProduct") &&
      !p5.contains("BroadcastNestedLoopJoin"), p5)
    assert(p5.split("BroadcastHashJoin").length - 1 >= 2, p5) // nation + region
    val p10 = planOf(TpchQueries.q10(spark, sfDir))
    assert(!p10.contains("CartesianProduct") &&
      !p10.contains("BroadcastNestedLoopJoin"), p10)
    assert(p10.contains("TakeOrderedAndProject"), p10)
  }

  test("q2/q4/q13/q17: decorrelated classics keep hash joins and partitioned windows") {
    val p2 = planOf(TpchQueries.q2(spark, sfDir))
    assert(!p2.contains("CartesianProduct") &&
      !p2.contains("BroadcastNestedLoopJoin"), p2)
    assert(p2.contains("Window"), p2) // per-part min is a window, not a rejoin
    val p4 = planOf(TpchQueries.q4(spark, sfDir))
    assert(p4.contains("LeftSemi"), p4) // EXISTS → semi join
    // the non-equi date condition rides the orderkey hash join as a
    // residual — it must NOT demote the join to a nested loop
    assert(!p4.contains("BroadcastNestedLoopJoin") &&
      !p4.contains("CartesianProduct"), p4)
    val p13 = planOf(TpchQueries.q13(spark, sfDir))
    assert(p13.contains("LeftOuter"), p13) // the zero bucket survives
    val p17 = planOf(TpchQueries.q17(spark, sfDir))
    assert(p17.contains("Window"), p17) // correlated avg → one shuffle
    assert(!p17.contains("rangepartitioning"), p17) // never a global sort
    assert(p17.contains("BroadcastHashJoin"), p17) // brand filter broadcasts
  }

  test("q9/q16/q20/q21 + scalar trio: anti joins broadcast, one-shuffle decorrelations hold") {
    val p9 = planOf(TpchQueries.q9(spark, sfDir))
    assert(p9.split("BroadcastHashJoin").length - 1 >= 3, p9)
    val p16 = planOf(TpchQueries.q16(spark, sfDir))
    assert(p16.contains("LeftAnti") && p16.contains("BroadcastHashJoin"), p16)
    val p20 = planOf(TpchQueries.q20(spark, sfDir))
    // per-part total is a partitioned window; the only range partition
    // is the final presentation sort, never a single-task stage
    assert(p20.contains("Window") && !p20.contains("SinglePartition"), p20)
    val p21 = planOf(TpchQueries.q21(spark, sfDir))
    assert(!p21.contains("CartesianProduct") &&
      !p21.contains("BroadcastNestedLoopJoin"), p21)
    assert(p21.contains("TakeOrderedAndProject"), p21)
    // q15/q11/q22: the decorrelated scalar is a ONE-ROW broadcast (a
    // broadcast nested loop there is the point, not a smell), and the
    // twice-read reduced frame persists so the fact scans once
    Seq(TpchQueries.q15(spark, sfDir), TpchQueries.q11(spark, sfDir),
        TpchQueries.q22(spark, sfDir)).foreach { q =>
      val p = planOf(q)
      assert(p.contains("BroadcastNestedLoopJoin") ||
        p.contains("BroadcastHashJoin"), p)
      assert(!p.contains("CartesianProduct"), p)
      assert(p.contains("InMemoryTableScan"), p) // the persist barrier
    }
    spark.catalog.clearCache()
  }

  test("q7/q8: two-role nation joins stay equi; every dimension hop broadcasts") {
    Seq(TpchQueries.q7(spark, sfDir), TpchQueries.q8(spark, sfDir)).foreach { q =>
      val p = planOf(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), p)
      assert(p.split("BroadcastHashJoin").length - 1 >= 2, p)
    }
  }

  test("gapFill: every exchange hashes on the key family, none single-partition") {
    val ev = Tables.load(spark, sfDir, "events")
    val plan = planOf(graft.ops.Resample.gapFill(ev, 3600L))
    assert(!plan.contains("SinglePartition"), plan)
    // the carry-forward is a running window WITHIN key slices - no
    // rangepartitioning (global sort) anywhere
    assert(!plan.contains("rangepartitioning"), plan)
  }

  test("parquet aggregate pushdown: whole-file MIN/MAX/COUNT answer from footers only") {
    // needs the v2 parquet source: v1 (the default route) has no
    // aggregate pushdown path at all
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    try {
      val plan = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .agg(min(col("l_orderkey")), max(col("l_orderkey")), count(lit(1)))
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      // footer statistics serve the aggregate - zero row groups decoded
      assert(plan.contains("PushedAggregation") &&
        plan.contains("MIN(l_orderkey)"), plan)
    } finally {
      spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
      spark.conf.unset("spark.sql.sources.useV1SourceList")
    }
  }

  test("simhashNear: candidates come from the block equi-join, never a product") {
    val docs = Tables.load(spark, sfDir, "documents")
    val plan = planOf(graft.ext.Dedup.simhashNear(docs, 3))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    // the self-join keys on (blk, bval) - an equi hash/sort-merge join
    assert(plan.contains("blk"), plan)
  }

  test("keyness: top-k is a WindowGroupLimit below the rank sort; " +
      "totals broadcast") {
    val docs = Tables.load(spark, sfDir, "documents")
    val plan = planOf(graft.ext.TextStats.keyness(docs, k = 5, minCount = 5))
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(plan.contains("BroadcastExchange"), plan)
  }

  test("sourceCosine: term self-join is equi (no product), norms broadcast") {
    val docs = Tables.load(spark, sfDir, "documents")
    val plan = planOf(graft.ext.TextStats.sourceCosine(docs))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("BroadcastExchange"), plan)
  }

  test("stickiness/newVsReturning: no Window operator anywhere - " +
      "rolling distinct is dedup-below-the-explode") {
    val ev = Tables.load(spark, sfDir, "events")
    val p1 = planOf(graft.ops.Journeys.stickiness(ev, longDays = 7))
    val p2 = planOf(graft.ops.Journeys.newVsReturning(ev))
    assert(!p1.contains("Window"), p1)
    assert(!p2.contains("Window"), p2)
  }
}
