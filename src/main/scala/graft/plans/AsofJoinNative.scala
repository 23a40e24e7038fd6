package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim}
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** The top rung of the extension ladder (SURVEY §2.9c): a WHOLE-OPERATOR
  * extension — custom `LogicalPlan` node + `SparkStrategy` + physical
  * `SparkPlan` — for the backward AS-OF JOIN, the time-series join Spark
  * has no native operator for.
  *
  * The engine already ships a composed formulation
  * ([[graft.ops.AsofJoin.asofBackward]]: union + carry-forward window,
  * one keyed shuffle). This native operator is the plan Spark WOULD give
  * the operator if it were built in, and is strictly leaner:
  *
  *  - the two sides co-partition on the key (`ClusteredDistribution`
  *    pair — the same mechanism sort-merge join uses, so
  *    EnsureRequirements/AQE place and coalesce the exchanges exactly
  *    as they would for SMJ) and sort within partitions on (key, ts);
  *  - each partition then runs a single streaming MERGE: the right
  *    pointer only advances (O(|L|+|R|) per partition, zero allocation
  *    beyond one held row), where the union form pays for building,
  *    shuffling, and windowing a unified frame with struct-wrapped
  *    payloads and the window operator buffers whole key groups;
  *  - no row ever carries both sides' payload until the moment it is
  *    emitted.
  *
  * Semantics are IDENTICAL to `asofBackward` (parity-pinned in
  * AsofNativeSpec, oracle-gated against DuckDB's native `ASOF LEFT
  * JOIN`): latest right row with `r.ts <= l.ts` per key; equal
  * timestamps match; left rows with no prior right row emit null match
  * columns; several right rows at the same (key, ts) resolve to the
  * greatest payload (the right ordering includes the payload columns);
  * null-keyed right rows never match (dropped by the wrapper, the
  * equi-join convention); null left timestamps never match.
  */
case class AsofJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute,
    broadcastRight: Option[Boolean] = None) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: one custom logical node → the physical operator the
  * STATS call for, exactly how Spark's own JoinSelection picks between
  * BroadcastHashJoin and SortMergeJoin: a right side whose estimated
  * size fits `spark.sql.autoBroadcastJoinThreshold` plans as
  * [[BroadcastAsofJoinExec]] (the probe side never shuffles OR sorts);
  * anything bigger plans as the co-partitioned merge
  * [[AsofJoinExec]]. `broadcastRight` overrides the stats decision both
  * ways (the `broadcast()`-hint equivalent). Injected via
  * `SparkSessionExtensions.injectPlannerStrategy` (config path) and
  * added idempotently to `spark.experimental.extraStrategies` by the
  * wrapper (library path). */
object AsofJoinStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lts, rts, bcast) =>
      val threshold =
        org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      val doBroadcast = bcast.getOrElse(
        threshold > 0 && r.stats.sizeInBytes <= threshold)
      if (doBroadcast)
        BroadcastAsofJoinExec(lk, rk, lts, rts, planLater(l), planLater(r)) :: Nil
      else
        AsofJoinExec(lk, rk, lts, rts, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // one left row in, one row out: the left child's partitioning survives
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  private def rightPayload: Seq[Attribute] =
    right.output.filterNot(a =>
      rightKeys.exists(_.exprId == a.exprId) || a.exprId == rightTs.exprId)

  // right side additionally orders by the payload so duplicate
  // (key, ts) rows resolve deterministically (greatest payload wins —
  // the asofBackward contract)
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      (SortOrder(rightTs, Ascending) +:
        rightPayload.filter(a => RowOrdering.isOrderable(a.dataType))
          .map(SortOrder(_, Ascending))))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTsAttr = leftTs; val rTsAttr = rightTs
    left.execute().zipPartitions(right.execute()) { (lIter, rIterRaw) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val keyOrd =
        RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val lTsBound = BindReferences.bindReference(
        lTsAttr: org.apache.spark.sql.catalyst.expressions.Expression, lOut)
      val rTsBound = BindReferences.bindReference(
        rTsAttr: org.apache.spark.sql.catalyst.expressions.Expression, rOut)
      // bind against nullability-WIDENED right attrs: unmatched rows put
      // a null row on the right side, and a BoundReference that kept the
      // child's nullable=false would read raw zeros instead of nulls
      val outProj = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)
      val rIter = rIterRaw.buffered
      var heldRow: InternalRow = null
      var heldKey: InternalRow = null
      lIter.map { lrow =>
        val lKey = lKeyProj(lrow)
        val lTsV = lTsBound.eval(lrow)
        // advance the right pointer past every row at or before
        // (lKey, lTs); the last eligible row of the CURRENT key is held
        var continue = lTsV != null
        while (continue && rIter.hasNext) {
          val rrow = rIter.head
          val rKey = rKeyProj(rrow)
          val c = keyOrd.compare(rKey, lKey)
          if (c < 0) {
            rIter.next() // keys already behind every remaining left row
          } else if (c == 0) {
            val rTsV = rTsBound.eval(rrow)
            if (rTsV == null) rIter.next() // null ts never matches
            else if (rTsV.asInstanceOf[Long] <= lTsV.asInstanceOf[Long]) {
              heldKey = rKey.copy()
              heldRow = rIter.next().copy()
            } else continue = false
          } else continue = false
        }
        val matched = heldKey != null && lTsV != null &&
          keyOrd.compare(heldKey.asInstanceOf[org.apache.spark.sql.catalyst.expressions.UnsafeRow], lKey) == 0
        if (matched) numMatched += 1
        numOutputRows += 1
        outProj(joined(lrow, if (matched) heldRow else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** BROADCAST backward as-of join — the physical shape for the dominant
  * real deployment: a huge fact stream (trades, events, sensor reads)
  * joined as-of against a SMALL dimension history (quotes snapshots,
  * config versions, exchange rates). The co-partitioned merge
  * ([[AsofJoinExec]]) is the right plan when both sides are big, but it
  * exchanges AND sorts the probe side; at 100 TB probe / 100 MB build,
  * that shuffle is the entire job cost. Here the right side ships as
  * one broadcast (`BroadcastDistribution(IdentityBroadcastMode)`, so
  * EnsureRequirements/AQE insert and REUSE the exchange exactly as for
  * BroadcastHashJoin), the left side keeps its partitioning AND its
  * ordering (both `outputPartitioning`/`outputOrdering` pass through —
  * a downstream key-grouped op pays nothing extra), and each task
  * probes a per-key binary-searchable (ts, payload)-sorted index.
  *
  * The index builds once per TASK from the executor-shared broadcast
  * array — O(|R| log |R|) against a dimension-sized |R|, the same
  * trade BroadcastNestedLoopJoin makes, without driver-side relation
  * building. Matching semantics are bit-identical to [[AsofJoinExec]]
  * (same dup resolution: greatest (ts, payload) ≤ lTs wins; null left
  * ts and null right ts never match) — parity-pinned in AsofNativeSpec.
  */
case class BroadcastAsofJoinExec(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // the probe side is untouched: partitioning AND ordering survive
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution ::
      org.apache.spark.sql.catalyst.plans.physical.BroadcastDistribution(
        org.apache.spark.sql.catalyst.plans.physical.IdentityBroadcastMode) :: Nil

  private def rightPayload: Seq[Attribute] =
    right.output.filterNot(a =>
      rightKeys.exists(_.exprId == a.exprId) || a.exprId == rightTs.exprId)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTsAttr = leftTs; val rTsAttr = rightTs
    val rPayload = rightPayload
    val broadcastedRight = right.executeBroadcast[Array[InternalRow]]()
    left.execute().mapPartitions { lIter =>
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val lTsBound = BindReferences.bindReference(
        lTsAttr: org.apache.spark.sql.catalyst.expressions.Expression, lOut)
      val rTsBound = BindReferences.bindReference(
        rTsAttr: org.apache.spark.sql.catalyst.expressions.Expression, rOut)
      // group order = (ts, orderable payload) ASC, the AsofJoinExec
      // right-ordering contract: the LAST eligible row is the match
      val groupOrder = SortOrder(rTsAttr, Ascending) +:
        rPayload.filter(a => RowOrdering.isOrderable(a.dataType))
          .map(SortOrder(_, Ascending))
      val rowOrd = RowOrdering.create(groupOrder, rOut)
      // per-task index: key -> rows sorted by (ts, payload), ts array
      // extracted for the binary search
      val index = new scala.collection.mutable.HashMap[
        InternalRow, scala.collection.mutable.ArrayBuffer[InternalRow]]()
      broadcastedRight.value.foreach { rrow =>
        if (rTsBound.eval(rrow) != null) // null right ts never matches
          index.getOrElseUpdate(rKeyProj(rrow).copy(),
            new scala.collection.mutable.ArrayBuffer[InternalRow]()) += rrow
      }
      val sorted: scala.collection.Map[InternalRow, (Array[InternalRow], Array[Long])] =
        index.map { case (k, rows) =>
          val arr = rows.sortWith((a, b) => rowOrd.compare(a, b) < 0).toArray
          k -> ((arr, arr.map(r => rTsBound.eval(r).asInstanceOf[Long])))
        }
      val outProj = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)
      lIter.map { lrow =>
        val lTsV = lTsBound.eval(lrow)
        var m: InternalRow = null
        if (lTsV != null) {
          sorted.get(lKeyProj(lrow)) match {
            case Some((rows, tss)) =>
              // greatest index with ts <= lTs (upper bound - 1)
              val t = lTsV.asInstanceOf[Long]
              var lo = 0; var hi = rows.length // first index with ts > t
              while (lo < hi) {
                val mid = (lo + hi) >>> 1
                if (tss(mid) <= t) lo = mid + 1 else hi = mid
              }
              if (lo > 0) m = rows(lo - 1)
            case None =>
          }
        }
        if (m != null) numMatched += 1
        numOutputRows += 1
        outProj(joined(lrow, if (m != null) m else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry point for the native operator. */
object AsofJoinNative {

  private val tsTypes: Set[org.apache.spark.sql.types.DataType] =
    Set(TimestampType, TimestampNTZType, LongType)

  /** Backward as-of join through the custom physical operator — same
    * signature and semantics as [[graft.ops.AsofJoin.asofBackward]].
    * Right columns come back prefixed (keys dropped — they equal the
    * left keys on matched rows and null otherwise).
    *
    * `broadcastRight`: `None` (default) lets the strategy pick by right-
    * side size stats vs `spark.sql.autoBroadcastJoinThreshold` — small
    * dimension histories broadcast (probe side untouched), big ones
    * co-partition and merge; `Some(true)`/`Some(false)` force one
    * physical shape (the broadcast/no-broadcast hint pair). */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, rightPrefix: String = "r_",
      broadcastRight: Option[Boolean] = None): DataFrame = {
    require(keys.nonEmpty, "asof join needs at least one key column")
    val spark = left.sparkSession
    // equi-join convention: null-keyed right rows never match; fresh
    // aliases give every right attribute a new exprId so a self-join
    // (both sides reading the same table) cannot alias-collide
    val rCols = right.columns.toSeq
    val rFresh = right
      .where(keys.map(col(_).isNotNull).reduce(_ && _))
      .select(rCols.map(c => col(c).as("_r_" + c)): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rFresh.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found"))
    val node = AsofJoinNode(lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(k => attr(rPlan, "_r_" + k)),
      attr(lPlan, tsCol), attr(rPlan, "_r_" + tsCol), broadcastRight)
    require(tsTypes.contains(node.leftTs.dataType) &&
      tsTypes.contains(node.rightTs.dataType),
      s"asof ts must be timestamp/long, got ${node.leftTs.dataType}")
    // library path: make the strategy available even when the session
    // was built without spark.sql.extensions=graft.plans.GraftExtensions
    val em = spark.experimental
    if (!em.extraStrategies.contains(AsofJoinStrategy))
      em.extraStrategies = em.extraStrategies :+ AsofJoinStrategy
    val out = GraftSqlShim.ofRows(spark, node)
    out.toDF(left.columns.toSeq ++ rCols.map(rightPrefix + _): _*)
      .drop(keys.map(rightPrefix + _): _*)
  }
}
