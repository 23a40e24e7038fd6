package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim}
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** The second whole-operator extension (after [[AsofJoinNode]]): a
  * native KEYED INTERVAL-OVERLAP JOIN — inner join of two interval
  * tables on key equality plus `lStart ≤ rEnd AND rStart ≤ lEnd`
  * (closed bounds), the temporal-correlation join (incident windows ×
  * activity windows, genomics range intersection).
  *
  * Spark plans the raw predicate as an equi join with the overlap as a
  * post-join FILTER over every same-key pair — O(|L_k|·|R_k|) pairs
  * per key materialized before filtering. The engine's compositional
  * answer ([[graft.ops.RangeJoin.intervalOverlap]]) bucket-quantizes to
  * bound pair work but pays the explode fan-out and re-dedup
  * discipline. This operator is the plan a database gives the join: the
  * two sides co-partition on the key (`ClusteredDistribution` pair —
  * EnsureRequirements/AQE place the exchanges exactly as for SMJ), sort
  * within partitions on (key, start), then one per-partition MERGE
  * SWEEP in start order with two bounded ACTIVE windows:
  *
  *  - processing a row with start s first evicts every active interval
  *    (both sides) with end < s — dead for every future row too, since
  *    starts only grow;
  *  - the surviving opposite-side actives are exactly its overlap
  *    partners (their start ≤ s by sweep order, their end ≥ s by
  *    eviction) — each pair emitted exactly once, at its later-start
  *    endpoint;
  *  - memory = the maximum number of CONCURRENTLY OPEN intervals per
  *    key at any instant (the answer's own width), never the key group.
  *
  * Degenerate inputs: null keys, null bounds, and reversed intervals
  * (end < start) never match — dropped by the wrapper, matching SQL
  * predicate semantics (`null ≤ x` is never true) and
  * `intervalOverlap`'s documented rule.
  */
case class IntervalJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftStart: Attribute, leftEnd: Attribute,
    rightStart: Attribute, rightEnd: Attribute,
    broadcastRight: Option[Boolean] = None,
    relationalSemantics: Boolean = false) extends BinaryNode {
  // relationalSemantics = true (the optimizer-rewrite path,
  // [[IntervalJoinRewrite]]): REVERSED intervals (end < start) keep the
  // plain SQL predicate semantics — they can still match — instead of
  // the wrapper contract's drop. The sweep exec carries a residual
  // check that makes this exact; the broadcast probe is naturally exact.
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Physical selection mirrors [[AsofJoinStrategy]]: a right side whose
  * size stats fit `spark.sql.autoBroadcastJoinThreshold` plans as
  * [[BroadcastIntervalJoinExec]] (probe side untouched); bigger sides
  * co-partition and merge-sweep. `broadcastRight` overrides both ways. */
object IntervalJoinStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: IntervalJoinNode =>
      val threshold =
        org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      val doBroadcast = n.broadcastRight.getOrElse(
        threshold > 0 && n.right.stats.sizeInBytes <= threshold)
      if (doBroadcast)
        BroadcastIntervalJoinExec(n.leftKeys, n.rightKeys,
          n.leftStart, n.leftEnd, n.rightStart, n.rightEnd,
          planLater(n.left), planLater(n.right)) :: Nil
      else
        IntervalJoinExec(n.leftKeys, n.rightKeys,
          n.leftStart, n.leftEnd, n.rightStart, n.rightEnd,
          planLater(n.left), planLater(n.right),
          n.relationalSemantics) :: Nil
    case _ => Nil
  }
}

case class IntervalJoinExec(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftStart: Attribute, leftEnd: Attribute,
    rightStart: Attribute, rightEnd: Attribute,
    left: SparkPlan, right: SparkPlan,
    relationalSemantics: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftStart, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightStart, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val lKeys = leftKeys; val rKeys = rightKeys
    val (lsA, leA, rsA, reA) = (leftStart, leftEnd, rightStart, rightEnd)
    left.execute().zipPartitions(right.execute()) { (lIterRaw, rIterRaw) =>
      import org.apache.spark.sql.catalyst.expressions.Expression
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val lsB = BindReferences.bindReference(lsA: Expression, lOut)
      val leB = BindReferences.bindReference(leA: Expression, lOut)
      val rsB = BindReferences.bindReference(rsA: Expression, rOut)
      val reB = BindReferences.bindReference(reA: Expression, rOut)
      val outProj = UnsafeProjection.create(outAttrs, lOut ++ rOut)
      val joined = new JoinedRow
      val lIter = lIterRaw.buffered
      val rIter = rIterRaw.buffered

      val relational = relationalSemantics
      new Iterator[InternalRow] {
        // (end, start, row) actives per side; rows are defensive copies
        private val lActive = mutable.ArrayBuffer.empty[(Long, Long, InternalRow)]
        private val rActive = mutable.ArrayBuffer.empty[(Long, Long, InternalRow)]
        private val pending = mutable.Queue.empty[(InternalRow, InternalRow)]
        private var curKey: UnsafeRow = null

        private def longOf(v: Any): Long = v.asInstanceOf[Long]

        /** true = take left next; merged (key, start) order, left on ties
          * (either tie order yields each overlapping pair exactly once). */
        private def takeLeft: Boolean =
          if (!rIter.hasNext) true
          else if (!lIter.hasNext) false
          else {
            val c = keyOrd.compare(lKeyProj(lIter.head), rKeyProj(rIter.head))
            if (c != 0) c < 0
            else {
              val ls = lsB.eval(lIter.head)
              val rs = rsB.eval(rIter.head)
              if (ls == null) true // null bounds drop immediately anyway
              else if (rs == null) false
              else longOf(ls) <= longOf(rs)
            }
          }

        private def step(): Unit = {
          val fromLeft = takeLeft
          val (keyProj, sB, eB, own, other) =
            if (fromLeft) (lKeyProj, lsB, leB, lActive, rActive)
            else (rKeyProj, rsB, reB, rActive, lActive)
          val iter = if (fromLeft) lIter else rIter
          val key = keyProj(iter.head)
          if (curKey == null || keyOrd.compare(key, curKey) != 0) {
            lActive.clear(); rActive.clear()
            curKey = key.copy()
          }
          val row = iter.next()
          val sV = sB.eval(row)
          val eV = eB.eval(row)
          // wrapper path pre-drops reversed intervals (contract);
          // rewrite path keeps them — plain predicate semantics
          if (sV != null && eV != null &&
              (relational || longOf(eV) >= longOf(sV))) {
            val s = longOf(sV)
            val e = longOf(eV)
            // evict dead intervals everywhere: end < s can never match again
            lActive.filterInPlace(_._1 >= s)
            rActive.filterInPlace(_._1 >= s)
            val kept = row.copy()
            // survivor ends are >= s (one predicate direction); the
            // residual oStart <= e is the other — always true for valid
            // rows (oStart <= s <= e by sweep order) but REQUIRED for a
            // reversed current row, whose end sits below its start
            other.foreach { case (_, oStart, o) =>
              if (oStart <= e)
                pending.enqueue(if (fromLeft) (kept, o) else (o, kept))
            }
            own.append((e, s, kept))
          }
        }

        override def hasNext: Boolean = {
          while (pending.isEmpty && (lIter.hasNext || rIter.hasNext)) step()
          pending.nonEmpty
        }

        override def next(): InternalRow = {
          val (l, r) = pending.dequeue()
          numOutputRows += 1
          outProj(joined(l, r))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)
}

/** BROADCAST keyed interval-overlap join — the physical shape when the
  * interval table is dimension-sized (incident windows, maintenance
  * windows, promo periods) and the probe side is the 100 TB stream:
  * the merge sweep ([[IntervalJoinExec]]) exchanges AND sorts both
  * sides, which at that asymmetry is pure overhead. Here the right
  * side ships once per executor (`BroadcastDistribution(
  * IdentityBroadcastMode)`), the probe side keeps its partitioning and
  * ordering, and each task probes a per-key START-SORTED index with a
  * PREFIX-MAX-END bound: candidates are the rows with start ≤ lEnd
  * (binary search); walking them backwards stops as soon as
  * maxEnd[0..i] < lStart — no earlier interval can still reach the
  * probe, so the scan is output-bound plus one early-stop probe (the
  * augmented-interval-tree trick flattened onto a sorted array).
  * Same match semantics as the sweep (closed bounds; invalid rows
  * dropped by the wrapper) — parity-pinned in IntervalNativeSpec. */
case class BroadcastIntervalJoinExec(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftStart: Attribute, leftEnd: Attribute,
    rightStart: Attribute, rightEnd: Attribute,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def outputPartitioning
      : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning

  // the probe-side flatMap preserves row order within a partition, so
  // the probe ordering passes through too — without this, a downstream
  // sort-consumer re-sorts an already-ordered probe side
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution ::
      org.apache.spark.sql.catalyst.plans.physical.BroadcastDistribution(
        org.apache.spark.sql.catalyst.plans.physical.IdentityBroadcastMode) :: Nil

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val lKeys = leftKeys; val rKeys = rightKeys
    val (lsA, leA, rsA, reA) = (leftStart, leftEnd, rightStart, rightEnd)
    val broadcastedRight = right.executeBroadcast[Array[InternalRow]]()
    left.execute().mapPartitions { lIter =>
      import org.apache.spark.sql.catalyst.expressions.Expression
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lsB = BindReferences.bindReference(lsA: Expression, lOut)
      val leB = BindReferences.bindReference(leA: Expression, lOut)
      val rsB = BindReferences.bindReference(rsA: Expression, rOut)
      val reB = BindReferences.bindReference(reA: Expression, rOut)
      // per-task index: key -> (starts sorted asc, ends, prefix-max end,
      // rows). The wrapper already dropped null/reversed right rows.
      val grouped = new mutable.HashMap[InternalRow, mutable.ArrayBuffer[
        (Long, Long, InternalRow)]]()
      broadcastedRight.value.foreach { rrow =>
        val sV = rsB.eval(rrow); val eV = reB.eval(rrow)
        if (sV != null && eV != null) {
          grouped.getOrElseUpdate(rKeyProj(rrow).copy(),
            new mutable.ArrayBuffer[(Long, Long, InternalRow)]()) +=
            ((sV.asInstanceOf[Long], eV.asInstanceOf[Long], rrow))
        }
      }
      val index: scala.collection.Map[InternalRow,
          (Array[Long], Array[Long], Array[Long], Array[InternalRow])] =
        grouped.map { case (k, buf) =>
          val sorted = buf.sortBy(t => (t._1, t._2)).toArray
          val starts = sorted.map(_._1)
          val ends = sorted.map(_._2)
          val maxEnd = new Array[Long](ends.length)
          var m = Long.MinValue
          var i = 0
          while (i < ends.length) { m = math.max(m, ends(i)); maxEnd(i) = m; i += 1 }
          k -> ((starts, ends, maxEnd, sorted.map(_._3)))
        }
      val outProj = UnsafeProjection.create(outAttrs, lOut ++ rOut)
      val joined = new JoinedRow
      lIter.flatMap { lrow =>
        val sV = lsB.eval(lrow); val eV = leB.eval(lrow)
        if (sV == null || eV == null) Iterator.empty
        else index.get(lKeyProj(lrow)) match {
          case None => Iterator.empty
          case Some((starts, ends, maxEnd, rows)) =>
            val ls = sV.asInstanceOf[Long]; val le = eV.asInstanceOf[Long]
            // upper bound: first index with start > le
            var lo = 0; var hi = starts.length
            while (lo < hi) {
              val mid = (lo + hi) >>> 1
              if (starts(mid) <= le) lo = mid + 1 else hi = mid
            }
            val lheld = lrow.copy()
            // walk candidates backwards; prefix-max lets us stop the
            // moment nothing earlier can still reach ls
            new Iterator[InternalRow] {
              private var i = lo - 1
              private var nextRow: InternalRow = null
              private def advance(): Unit = {
                nextRow = null
                while (nextRow == null && i >= 0 && maxEnd(i) >= ls) {
                  if (ends(i) >= ls) nextRow = rows(i)
                  i -= 1
                }
              }
              advance()
              override def hasNext: Boolean = nextRow != null
              override def next(): InternalRow = {
                val r = nextRow
                advance()
                numOutputRows += 1
                outProj(joined(lheld, r))
              }
            }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastIntervalJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry point for the native interval join. */
object IntervalJoinNative {

  private val boundTypes: Set[org.apache.spark.sql.types.DataType] =
    Set(TimestampType, TimestampNTZType, LongType)

  /** Keyed interval-overlap INNER join through the custom physical
    * operator: rows with equal keys whose [start, end] intervals
    * overlap (closed bounds). Right columns come back prefixed, right
    * keys dropped (they equal the left keys on every output row). */
  def overlapJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      startL: String, endL: String, startR: String, endR: String,
      rightPrefix: String = "r_",
      broadcastRight: Option[Boolean] = None): DataFrame = {
    require(keys.nonEmpty, "interval join needs at least one key column")
    val spark = left.sparkSession
    def clean(df: DataFrame, s: String, e: String) = df.where(
      keys.map(col(_).isNotNull).reduce(_ && _) &&
        col(s).isNotNull && col(e).isNotNull && col(e) >= col(s))
    val rCols = right.columns.toSeq
    // fresh right aliases: a self-join must not alias-collide exprIds
    val rFresh = clean(right, startR, endR)
      .select(rCols.map(c => col(c).as("_r_" + c)): _*)
    val lPlan = clean(left, startL, endL).queryExecution.analyzed
    val rPlan = rFresh.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found"))
    val node = IntervalJoinNode(lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(k => attr(rPlan, "_r_" + k)),
      attr(lPlan, startL), attr(lPlan, endL),
      attr(rPlan, "_r_" + startR), attr(rPlan, "_r_" + endR),
      broadcastRight)
    Seq(node.leftStart, node.leftEnd, node.rightStart, node.rightEnd)
      .foreach(a => require(boundTypes.contains(a.dataType),
        s"interval bounds must be timestamp/long, got ${a.dataType} (${a.name})"))
    val em = spark.experimental
    if (!em.extraStrategies.contains(IntervalJoinStrategy))
      em.extraStrategies = em.extraStrategies :+ IntervalJoinStrategy
    val out = GraftSqlShim.ofRows(spark, node)
    out.toDF(left.columns.toSeq ++ rCols.map(rightPrefix + _): _*)
      .drop(keys.map(rightPrefix + _): _*)
  }
}
