package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join — "which points fall inside which intervals" —
  * with NO equi key. Spark plans a bare range predicate as a broadcast
  * nested loop (or a cartesian product): O(|P|·|I|) comparisons no
  * matter how selective the containment is. The standard distributed
  * fix is BUCKETING: quantize time into fixed-width buckets, explode
  * each interval into the buckets it covers, tag each point with its
  * single bucket, hash-join on the bucket, and keep only exact
  * containment.
  *
  *  - COMPLETE: a contained point's bucket is by construction among its
  *    interval's covered buckets.
  *  - DUPLICATE-FREE without a distinct: a point has exactly ONE
  *    bucket, so each qualifying (point, interval) pair meets on
  *    exactly one join row — no post-join dedup shuffle.
  *  - Cost: |I| · (len/bucketWidth + 2) exploded rows. Pick the bucket
  *    width near the median interval length (~2 rows per interval);
  *    degenerate very-long intervals fan out proportionally and a hot
  *    bucket (many co-located intervals) is ordinary join skew — AQE's
  *    skew-join split applies, same as any keyed join.
  *
  * Both interval bounds are INCLUSIVE (BETWEEN semantics, matching the
  * relational formulation). Intervals with end < start are dropped —
  * `sequence` would otherwise count DOWN and bucket them backwards. */
object RangeJoin {

  /** Bucket index: unix_micros(cast(.. AS TIMESTAMP)) — a no-op for
    * TIMESTAMP, the session-zone pin for TIMESTAMP_NTZ. The type is
    * checked so any other input fails loudly instead of silently
    * reinterpreting (cast from LONG would read seconds). */
  private[graft] def requireTs(df: DataFrame, name: String, op: String): Unit = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val dt = df.schema(name).dataType
    require(dt == TimestampType || dt == TimestampNTZType,
      s"$op column $name must be TIMESTAMP/TIMESTAMP_NTZ, got $dt")
  }

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      ptCol: String, startCol: String, endCol: String,
      bucketSeconds: Long = 600L): DataFrame = {
    require(bucketSeconds >= 1, s"bucketSeconds must be >= 1, got $bucketSeconds")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"points and intervals must not share column names, both have: $overlap")
    val w = bucketSeconds * 1000000L
    requireTs(points, ptCol, "pointInInterval")
    requireTs(intervals, startCol, "pointInInterval")
    requireTs(intervals, endCol, "pointInInterval")
    def b(c: org.apache.spark.sql.Column) =
      floor(unix_micros(c.cast("timestamp")) / w)
    val pts = points.withColumn("_b", b(col(ptCol)))
    val ivs = intervals
      .where(col(endCol) >= col(startCol))
      .withColumn("_b", explode(sequence(b(col(startCol)), b(col(endCol)))))
    pts.join(ivs, Seq("_b"))
      .where(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("_b")
  }

  /** Interval × interval OVERLAP join — both sides are ranges (the
    * genomics/incident-correlation shape [[pointInInterval]] cannot
    * express). Same bucket-quantization idea, with the dedup rule
    * adapted: both sides explode into covered buckets, so an
    * overlapping pair meets in EVERY shared bucket — the pair is kept
    * only in the bucket containing the OVERLAP START `max(startL,
    * startR)`. That instant lies inside both intervals (it IS one
    * side's start and ≤ both ends for any overlapping pair), so
    * exactly one join row survives per qualifying pair: complete AND
    * duplicate-free, still no distinct, never a nested loop.
    *
    * Overlap is inclusive on both bounds (`startL ≤ endR AND startR ≤
    * endL`). Degenerate reversed intervals (end < start) are dropped
    * on both sides, as in [[pointInInterval]]. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      startL: String, endL: String, startR: String, endR: String,
      bucketSeconds: Long = 600L): DataFrame = {
    require(bucketSeconds >= 1, s"bucketSeconds must be >= 1, got $bucketSeconds")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"left and right must not share column names, both have: $shared")
    val w = bucketSeconds * 1000000L
    Seq(startL -> left, endL -> left, startR -> right, endR -> right)
      .foreach { case (c, df) => requireTs(df, c, "intervalOverlap") }
    def b(c: org.apache.spark.sql.Column) =
      floor(unix_micros(c.cast("timestamp")) / w)
    val l = left.where(col(endL) >= col(startL))
      .withColumn("_b", explode(sequence(b(col(startL)), b(col(endL)))))
    val r = right.where(col(endR) >= col(startR))
      .withColumn("_b", explode(sequence(b(col(startR)), b(col(endR)))))
    l.join(r, Seq("_b"))
      .where(col(startL) <= col(endR) && col(startR) <= col(endL))
      .where(col("_b") === b(greatest(col(startL), col(startR))))
      .drop("_b")
  }
}
