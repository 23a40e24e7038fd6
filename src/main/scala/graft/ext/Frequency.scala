package graft.ext

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequency analysis for training-data pipelines: EXACT heavy hitters
  * without shuffling the full key space.
  *
  * The naive `groupBy(key).count.where(cnt >= T)` exchanges every
  * distinct key — at 100 TB that is a shuffle of the whole vocabulary /
  * URL space / user-id space to answer a question whose output is tiny.
  * The classic two-phase shape (the deterministic relative of
  * SpaceSaving / Misra–Gries candidate generation) avoids it:
  *
  *  1. CANDIDATES, zero shuffle: each partition counts its own rows in a
  *     hash map and emits only keys with local count ≥ ⌈T / P⌉. By
  *     pigeonhole, any key with global count ≥ T must reach that local
  *     threshold in at least one of the P partitions — so the candidate
  *     set is a SUPERSET of the answer under ANY partitioning (P is read
  *     from `TaskContext.numPartitions` inside the task, so the
  *     guarantee can't drift from a stale planning-time partition
  *     count). Per-partition distinct keys bound the map's memory —
  *     the same bound a map-side partial aggregate needs.
  *  2. VERIFY, exact: the (small — at most P·rows/T entries) candidate
  *     set broadcasts; rows semi-join it and only THEIR keys are
  *     exactly counted and filtered to ≥ T. False candidates die here,
  *     so the final output is exactly the true heavy hitters —
  *     oracle-checkable against a plain relational HAVING.
  *
  * `mapPartitions` is deliberate (per-partition hash-map lifecycle is
  * the point); everything else stays declarative. Null keys are
  * excluded, as in a relational GROUP BY they'd form their own group —
  * callers who want them can coalesce first.
  */
object Frequency {

  /** Groups with ≥ `minDistinct` DISTINCT values of `distinctCol` —
    * the distinct-count sibling of [[heavyHitters]], sketch-first:
    *
    *  1. CANDIDATES: one HLL pass (`approx_count_distinct`, rsd 2%) per
    *     group — sketches partial-merge map-side, so the exchange
    *     carries one ~KB sketch per (partition, group) instead of every
    *     distinct (group, value) pair, which is what Spark's exact
    *     distinct aggregate must shuffle. Groups whose estimate reaches
    *     70% of the threshold become candidates. Unlike the pigeonhole
    *     bound in [[heavyHitters]] this superset is PROBABILISTIC — but
    *     missing a true group needs HLL to underestimate by 30% at
    *     rsd 2%, a >15σ event; the alternative (exact everywhere) is
    *     the full distinct shuffle this operator exists to avoid.
    *  2. VERIFY: exact `countDistinct` over the candidate groups only
    *     (broadcast semi-join), filtered to ≥ `minDistinct` — so every
    *     emitted row is exact and the output matches the plain
    *     relational HAVING.
    *
    * Null group keys are excluded (as in [[heavyHitters]]); null values
    * never count toward distinct totals in either engine. */
  def distinctHeavyGroups(df: DataFrame, groupCol: String, distinctCol: String,
      minDistinct: Long, rsd: Double = 0.02): DataFrame = {
    require(minDistinct >= 1, s"minDistinct must be >= 1, got $minDistinct")
    val rows = df.where(col(groupCol).isNotNull)
    val cands = rows.groupBy(col(groupCol))
      .agg(approx_count_distinct(col(distinctCol), rsd).as("_approx"))
      .where(col("_approx") >= math.ceil(minDistinct * 0.7).toLong)
      .select(col(groupCol))
    rows.join(broadcast(cands), Seq(groupCol), "left_semi")
      .groupBy(col(groupCol))
      .agg(countDistinct(col(distinctCol)).as("n_distinct"))
      .where(col("n_distinct") >= minDistinct)
  }

  def heavyHitters(df: DataFrame, keyCol: String, minCount: Long): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val sess = df.sparkSession
    import sess.implicits.newStringEncoder
    val keyed = df.select(col(keyCol).cast("string").as("_k"))
      .where(col("_k").isNotNull)
    val cands = keyed.as[String].mapPartitions { it =>
      val p = math.max(1, TaskContext.get().numPartitions())
      val localMin = math.max(1L, (minCount + p - 1) / p)
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach(k => m.update(k, m.getOrElse(k, 0L) + 1L))
      m.iterator.filter(_._2 >= localMin).map(_._1)
    }.toDF("_ck").distinct()
    df.join(broadcast(cands), col(keyCol).cast("string") === col("_ck"), "left_semi")
      .where(col(keyCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
  }
}
