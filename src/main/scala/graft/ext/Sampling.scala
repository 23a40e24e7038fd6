package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset-splitting operators for
  * training-data pipelines: ablation subsets, train/val/test splits,
  * per-language mixing rates.
  *
  * Everything keys off an md5-derived bucket of the ROW KEY, never a
  * random number: the same row lands in the same subset on every run,
  * on every engine, regardless of partitioning — which is what makes
  * splits reproducible across reshuffles and incremental re-runs (a
  * `rand()` sample changes membership whenever Spark re-executes the
  * stage, and can't be oracle-checked at all). Buckets are basis points
  * (1/10000) so rates like 0.25 % are exact.
  *
  * Scale shape: pure narrow expressions — the sample/split is decided
  * per row at scan speed with zero shuffle; a stratified rate lookup
  * broadcasts. */
object Sampling {

  /** md5-derived uniform bucket in [0, 10000). The key is stringified
    * first (a bigint key must hash its DECIMAL form, not raw bytes, to
    * match `md5(key::VARCHAR)` in any SQL engine). A NULL key buckets
    * to NULL and therefore falls out of every sample/split — coalesce
    * the key upstream if null-keyed rows must be retained. */
  def hashBucket(key: Column): Column =
    pmod(conv(substring(md5(key.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long"), lit(10000L))

  /** Deterministic sample: keep rows whose bucket falls below
    * `rateBp` basis points (rateBp = 1000 ⇒ 10 %). */
  def hashSample(df: DataFrame, keyCol: String, rateBp: Int): DataFrame =
    df.where(hashBucket(col(keyCol)) < rateBp)

  /** Deterministic split assignment: cumulative bucket ranges over
    * (label, basisPoints) weights, e.g. Seq(("train",8000), ("val",1000),
    * ("test",1000)). Weights must sum to ≤ 10000; rows past the total
    * get the last label (guards rounding). A NULL key yields a NULL
    * split — honoring [[hashBucket]]'s null-falls-out contract instead
    * of silently landing null-keyed rows in the final label (the
    * un-guarded CASE would); coalesce the key upstream to retain them. */
  def splitAssign(key: Column, splits: Seq[(String, Int)]): Column = {
    require(splits.nonEmpty && splits.map(_._2).sum <= 10000,
      "split weights are basis points and must sum to <= 10000")
    val b = hashBucket(key)
    val cuts = splits.scanLeft(0)(_ + _._2).tail
    val assigned = splits.zip(cuts).dropRight(1).foldRight(lit(splits.last._1): Column) {
      case (((label, _), cut), acc) => when(b < cut, lit(label)).otherwise(acc)
    }
    when(b.isNotNull, assigned)
  }

  /** Stratified deterministic sample: per-stratum rates in basis points
    * (e.g. lang → rate for language re-balancing), `defaultBp` for
    * strata not in the map. The rate table is tiny and inlined into the
    * expression — no join at all. */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Int], defaultBp: Int): DataFrame = {
    val rate = rates.foldRight(lit(defaultBp): Column) {
      case ((stratum, bp), acc) => when(col(strataCol) === stratum, lit(bp)).otherwise(acc)
    }
    df.where(hashBucket(col(keyCol)) < rate)
  }

  /** Sequence packing — assign documents to fixed-token-budget training
    * sequences by CONTIGUOUS fill in id order:
    * `seq_id = exclusive_prefix_sum(n_tokens) div budget`. Whole docs
    * are assigned (a doc straddling a boundary belongs to the sequence
    * its first token falls in); splitting straddlers is a trivial
    * downstream refinement, the hard part at scale is the ordered
    * global prefix sum — and a bare `Window.orderBy` computes it by
    * dragging the WHOLE corpus into one partition. This is the textbook
    * two-phase distributed scan instead:
    *
    *  1. range-partition by id, sort within partitions, persist — the
    *     persist is LOAD-BEARING: `repartitionByRange` samples its
    *     boundaries per action, and the totals pass and the assignment
    *     pass must observe the SAME partitioning;
    *  2. one tiny job collects per-partition token totals (P longs to
    *     the driver), whose prefix sums become per-partition offsets;
    *  3. each partition independently scans its sorted rows, carrying
    *     `offset + running` — narrow, no second shuffle.
    *
    * Output bins are a pure function of (id → n_tokens), independent of
    * partition boundaries — reproducible across runs, cluster sizes,
    * and engines (the oracle is a plain windowed prefix sum). Ids must
    * be unique: ties have no defined order in either formulation. */
  def packSequences(docs: DataFrame, budgetTokens: Long,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(budgetTokens >= 1, s"budgetTokens must be >= 1, got $budgetTokens")
    val sess = docs.sparkSession
    import sess.implicits.newProductEncoder
    val nPart = math.max(1, sess.sessionState.conf.numShufflePartitions)
    val ranged = docs
      .select(col(idCol).cast("long").as("_id"),
        TextStats.tokenCount(TextStats.tokens(col(textCol))).cast("long").as("_n"))
      .repartitionByRange(nPart, col("_id"))
      .sortWithinPartitions("_id")
      .persistScoped
      .as[(Long, Long)]
    val totals = ranged.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.get().partitionId()
      var s = 0L
      it.foreach(s += _._2)
      Iterator.single((pid, s))
    }.collect().toMap
    val offsets = (0 until nPart).scanLeft(0L)(_ + totals.getOrElse(_, 0L)).toArray
    val bOff = sess.sparkContext.broadcast(offsets)
    ranged.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.get().partitionId()
      var run = bOff.value(pid)
      it.map { case (id, n) =>
        val exclusive = run
        run += n
        (id, n, exclusive / budgetTokens)
      }
    }.toDF(idCol, "n_tokens", "seq_id")
  }
}
