package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression, GreaterThanOrEqual, IsNotNull, LessThanOrEqual, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** OPTIMIZER rule: recognize a plain relational keyed interval-overlap
  * join and replace it with the native operator — the user writes the
  * declarative form
  *
  * {{{ a.join(b, k && a("s") <= b("e2") && b("s2") <= a("e")) }}}
  *
  * and gets [[IntervalJoinExec]]'s merge sweep (or the broadcast probe
  * when stats allow) instead of Spark's equi-join with the overlap as a
  * post-join FILTER over every same-key pair — O(|L_k|·|R_k|) pairs per
  * key materialized before filtering, the quadratic cliff this engine's
  * native operator exists to remove. This is the last rung of the
  * extension ladder: the operator doesn't just exist, Catalyst now
  * CHOOSES it from the relational form, the same way a database picks a
  * physical join.
  *
  * The rewrite fires when an INNER join condition decomposes into
  *  - ≥ 1 attribute equi key (left attr = right attr),
  *  - EXACTLY one `lAttr ≤ rAttr` and one `rAttr ≤ lAttr` conjunct over
  *    timestamp/long attributes (any operand orientation; a point probe
  *    `p ≤ e2 AND s2 ≤ p` is the degenerate case — point-in-interval
  *    joins rewrite too),
  * and keeps every other conjunct as a residual Filter ON TOP of the
  * node (inner-join residuals commute with the join). IsNotNull guards
  * on keys and bounds are injected below the node — for an inner join
  * with these predicates they are implied, and the exec's merge relies
  * on them. The node runs with RELATIONAL semantics (reversed intervals
  * match per the predicate, not the wrapper's drop-contract), so the
  * rewrite is exactly answer-preserving — pinned by randomized parity
  * against the un-rewritten join in IntervalRewriteSpec.
  *
  * No-hint joins only: a user hint (broadcast etc.) states a physical
  * preference this rule must not override.
  */
object IntervalJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val boundTypes: Set[DataType] =
    Set(TimestampType, TimestampNTZType, LongType)

  /** Normalize a conjunct to `low ≤ high` over two attributes. */
  private def asLe(e: Expression): Option[(Attribute, Attribute)] = e match {
    case LessThanOrEqual(a: AttributeReference, b: AttributeReference) =>
      Some((a, b))
    case GreaterThanOrEqual(a: AttributeReference, b: AttributeReference) =>
      Some((b, a))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), JoinHint.NONE) =>
      val conjuncts = splitConjunctivePredicates(cond)
      def sideOf(a: Attribute): Int =
        if (left.outputSet.contains(a)) 0
        else if (right.outputSet.contains(a)) 1 else -1
      val equi = conjuncts.collect {
        case EqualTo(a: AttributeReference, b: AttributeReference)
            if sideOf(a) == 0 && sideOf(b) == 1 => (a, b)
        case EqualTo(a: AttributeReference, b: AttributeReference)
            if sideOf(a) == 1 && sideOf(b) == 0 => (b, a)
      }
      val les = conjuncts.flatMap(c => asLe(c).map(c -> _))
      // l.start <= r.end conjuncts and r.start <= l.end conjuncts
      val lToR = les.collect { case (c, (lo, hi))
        if sideOf(lo) == 0 && sideOf(hi) == 1 &&
          boundTypes.contains(lo.dataType) && lo.dataType == hi.dataType =>
        (c, lo, hi) }
      val rToL = les.collect { case (c, (lo, hi))
        if sideOf(lo) == 1 && sideOf(hi) == 0 &&
          boundTypes.contains(lo.dataType) && lo.dataType == hi.dataType =>
        (c, lo, hi) }
      // engine-internal composed operators (RangeJoin's bucket
      // formulations, the salting/blocking family) join on
      // underscore-prefixed working columns — their plan shapes are
      // deliberate and pinned, so the rewrite leaves them alone
      val internalJoin = equi.exists { case (a, b) =>
        a.name.startsWith("_") || b.name.startsWith("_") }
      if (!internalJoin && equi.nonEmpty && lToR.size == 1 && rToL.size == 1) {
        val (cLR, lStart, rEnd) = lToR.head
        val (cRL, rStart, lEnd) = rToL.head
        val equiExprs: Seq[Expression] = equi.map { case (a, b) =>
          EqualTo(a, b): Expression }
        val residual = conjuncts.filterNot(c =>
          (c eq cLR) || (c eq cRL) || equiExprs.exists(_ semanticEquals c))
        val lGuard = Filter(
          (equi.map(_._1) ++ Seq(lStart, lEnd)).distinct
            .map(IsNotNull(_): Expression).reduce(org.apache.spark.sql
              .catalyst.expressions.And(_, _)), left)
        val rGuard = Filter(
          (equi.map(_._2) ++ Seq(rStart, rEnd)).distinct
            .map(IsNotNull(_): Expression).reduce(org.apache.spark.sql
              .catalyst.expressions.And(_, _)), right)
        val node = IntervalJoinNode(lGuard, rGuard,
          equi.map(_._1), equi.map(_._2),
          lStart, lEnd, rStart, rEnd,
          broadcastRight = None, relationalSemantics = true)
        if (residual.isEmpty) node
        else Filter(residual.reduce(org.apache.spark.sql
          .catalyst.expressions.And(_, _)), node)
      } else j
  }
}
