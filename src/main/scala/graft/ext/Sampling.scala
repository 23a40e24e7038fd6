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
}
