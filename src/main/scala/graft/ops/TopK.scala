package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-group top-k WITHOUT shuffling the groups: a bounded-buffer
  * custom Aggregator whose PARTIAL buffers already hold at most k
  * entries, so the map-side combine prunes each partition's
  * contribution to ≤ k rows per group BEFORE the exchange.
  *
  * Spark itself prunes a `row_number() ≤ k` filter map-side since the
  * WindowGroupLimit rule (measured head-to-head in MetricsSpec: both
  * shapes ship ≤ k·partitions rows per group; with that rule disabled
  * the window ships EVERY row). What the window shape still cannot do,
  * and this Aggregator can:
  *  - ride the SAME groupBy as other aggregates — top-k alongside
  *    count/sum/mode in one shuffle instead of a window pass plus a
  *    re-aggregation;
  *  - yield the top-k as an ARRAY per group (no explode → re-group
  *    round-trip when the consumer wants the list);
  *  - prune inside ANY aggregation context (grouping sets, streaming
  *    foreachBatch partials) where a rank filter has no window to push
  *    into.
  *
  * Ordering: value DESC, ties by id ASC — fully deterministic. Null
  * values are ignored (SQL window ordering would sort them last and k
  * real rows always win; dropping them matches `WHERE v IS NOT NULL`).
  */
object TopK {

  /** Bounded descending-(value, asc id) buffer; insertion into a ≤ k
    * vector — k is small by contract, so O(k) insert beats heap
    * constant factors and keeps the buffer kryo-friendly. */
  final class TopKAgg(k: Int)
      extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {
    require(k >= 1, s"k must be >= 1, got $k")

    private def better(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

    private def insert(buf: List[(Double, Long)],
        x: (Double, Long)): List[(Double, Long)] = {
      val (pre, post) = buf.span(better(_, x))
      if (pre.lengthCompare(k) >= 0) buf
      else (pre ::: x :: post).take(k)
    }

    override def zero: List[(Double, Long)] = Nil
    override def reduce(b: List[(Double, Long)], a: (Double, Long)): List[(Double, Long)] =
      if (a._1.isNaN) b else insert(b, a)
    override def merge(b1: List[(Double, Long)], b2: List[(Double, Long)]): List[(Double, Long)] =
      b2.foldLeft(b1)(insert)
    override def finish(b: List[(Double, Long)]): Seq[(Double, Long)] = b
    override def bufferEncoder: Encoder[List[(Double, Long)]] =
      ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      ExpressionEncoder()
  }

  /** `df` → one row per (group, rank ≤ k): groupCols*, rnk, idCol,
    * ordCol. One ObjectHashAggregate pair (partial+final) and the
    * explode — nothing else. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], ordCol: String,
      idCol: String, k: Int): DataFrame = {
    val agg = udaf(new TopKAgg(k), ExpressionEncoder[(Double, Long)]())
    df.where(col(ordCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(agg(col(ordCol).cast("double"), col(idCol).cast("long")).as("_top"))
      .select(groupCols.map(col) :+ posexplode(col("_top")): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("pos") + 1).cast("int").as("rnk"),
        col("col._2").as(idCol), col("col._1").as(ordCol)): _*)
  }
}
