package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpr}
import org.apache.spark.sql.functions._

import graft.functions.{BloomContains, BloomPositions}

/** Bloom-prefilter join — the runtime-filter shape for joins where the
  * probe side is enormous and mostly non-matching.
  *
  * At 100 TB the cost of `big ⋈ small` is dominated by shuffling the
  * big side; when only a small fraction of its rows have partners, that
  * shuffle is almost entirely wasted motion. Broadcasting `small`
  * outright caps out quickly (its ROWS must fit in every executor), but
  * a Bloom filter of its JOIN KEYS is ~10 bits per key at 1% false
  * positives — a 100-million-key build side is a 120 MB bitset, still
  * shippable where the rows are not. Filtering the big side with that
  * bitset BEFORE its exchange drops non-matching rows at scan speed
  * (inside whole-stage codegen, pushed below the shuffle), and the real
  * join afterwards removes the false positives, so the result is exactly
  * the plain join. Same idea as Spark's AQE `InjectRuntimeFilter`, made
  * explicit and reusable (build once, prefilter many scans).
  *
  * Build is fully relational: hash keys → k bit positions
  * ([[BloomPositions]], codegen) → explode → `groupBy(word) bit_or` —
  * map-side combine collapses every partition to ≤ m/64 words, so the
  * build shuffle is kilobytes no matter how many rows feed it. Only the
  * assembled word array (m/8 bytes, driver-bounded by construction)
  * is collected.
  *
  * Null keys: `xxhash64` hashes a null to the seed (never returns
  * null), so nulls cost one bit and pass the prefilter — and are then
  * dropped by the inner join exactly as without the prefilter.
  */
object BloomJoin {

  /** An immutable built filter; reusable across any number of probes. */
  final case class KeyFilter(bits: Array[Long], k: Int) {
    def mBits: Int = bits.length * 64
    /** Predicate column: true iff `key` might be in the build set. */
    def mightContain(key: Column): Column =
      toColumn(BloomContains(toExpr(xxhash64(key)), bits, k))
  }

  /** Standard sizing (public formulas): m = −n·ln p ∕ (ln 2)², rounded
    * up to a multiple of 64; k = (m/n)·ln 2, clamped to ≥ 1. */
  def optimalParams(expectedItems: Long, fpp: Double): (Int, Int) = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1,
      s"need items>0 and 0<fpp<1, got $expectedItems, $fpp")
    val ln2 = math.log(2)
    val mRaw = math.ceil(-expectedItems * math.log(fpp) / (ln2 * ln2))
    val mBits = math.min(((mRaw.toLong + 63) / 64) * 64, 1L << 30).toInt
    val k = math.max(1, math.round(mBits.toDouble / expectedItems * ln2).toInt)
    (mBits, k)
  }

  /** Build a key filter from `df(key)` in one relational pass. */
  def build(df: DataFrame, key: String, expectedItems: Long,
      fpp: Double = 0.01): KeyFilter = {
    val (mBits, k) = optimalParams(expectedItems, fpp)
    val words = df
      .select(explode(toColumn(
        BloomPositions(toExpr(xxhash64(col(key))), k, mBits))).as("p"))
      .select(expr("cast(p div 64 as int)").as("w"),
        expr("shiftleft(cast(1 as bigint), p % 64)").as("b"))
      .groupBy("w").agg(bit_or(col("b")).as("word"))
      .collect()
    val bits = new Array[Long](mBits / 64)
    words.foreach(r => bits(r.getInt(0)) = r.getLong(1))
    KeyFilter(bits, k)
  }

  /** Drop big-side rows whose `key` cannot match the filter. */
  def prefilter(big: DataFrame, key: String, f: KeyFilter): DataFrame =
    big.where(f.mightContain(col(key)))

  /** Exact inner equi-join with the big side bloom-pruned first. The
    * extra job is the build's word aggregate (tiny); `smallCount`
    * avoids a separate count job when the caller already knows the
    * build-side cardinality. */
  def innerJoin(big: DataFrame, small: DataFrame, key: String,
      fpp: Double = 0.01, smallCount: Option[Long] = None): DataFrame = {
    val n = smallCount.getOrElse(small.count())
    val f = build(small, key, math.max(n, 1L), fpp)
    prefilter(big, key, f).join(small, Seq(key))
  }
}
