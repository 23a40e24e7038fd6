package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual, NamedExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, LongType, TimestampNTZType, TimestampType}

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
  *  - ≥ 1 attribute equi key (left attr = right attr) — none of them
  *    float/double (see below),
  *  - EXACTLY one `lBound ≤/< rBound` and one `rBound ≤/< lBound`
  *    conjunct over timestamp/long BOUND EXPRESSIONS (any operand
  *    orientation). A bound expression is an attribute or any
  *    deterministic arithmetic of one side's attributes and literals —
  *    so the band join `a.ts BETWEEN b.ts - δ AND b.ts + δ` (bounds of
  *    the form attribute ± literal, the most common user spelling of a
  *    time-band join) rewrites too: computed bounds are materialized as
  *    working columns by a Project under the node and dropped by a
  *    Project above it. STRICT bounds (`<`) rewrite as the relaxed `≤`
  *    node with the original strict conjunct re-applied as a residual
  *    filter — the relaxed node is a superset, so this is exact.
  * Every other conjunct stays as a residual Filter ON TOP of the node
  * (inner-join residuals commute with the join). IsNotNull guards on
  * keys and on the attributes each bound reads are injected below the
  * node — for an inner join with these predicates they are implied
  * (null in ⇒ null predicate ⇒ row excluded), and the exec's merge
  * relies on them. The node runs with RELATIONAL semantics (reversed
  * intervals match per the predicate, not the wrapper's drop-contract),
  * so the rewrite is exactly answer-preserving — pinned by randomized
  * parity against the un-rewritten join in IntervalRewriteSpec.
  *
  * Floating-point equi keys do NOT rewrite: Spark's
  * NormalizeFloatingNumbers rule only normalizes Join/Window nodes and
  * runs after this batch, so it never sees IntervalJoinNode — the execs
  * compare keys via RowOrdering / raw UnsafeRow bytes, under which
  * -0.0 ≠ 0.0 and NaN bit patterns differ, diverging from the SQL
  * EqualTo semantics the un-rewritten join would have produced.
  *
  * No-hint joins only: a user hint (broadcast etc.) states a physical
  * preference this rule must not override.
  */
object IntervalJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val boundTypes: Set[DataType] =
    Set(TimestampType, TimestampNTZType, LongType)

  /** A usable join bound: deterministic, timestamp/long-typed, built
    * from attributes + literals only (no subqueries, UDFs, or
    * aggregates sneak in), reading at least one attribute (a literal
    * bound is a one-sided filter, not a join bound). */
  private def isBoundExpr(e: Expression): Boolean = {
    def nodesOk(x: Expression): Boolean = x match {
      case _: AttributeReference => true
      case _: org.apache.spark.sql.catalyst.expressions.Literal => true
      case b => b.deterministic && b.children.nonEmpty &&
        b.children.forall(nodesOk)
    }
    e.deterministic && boundTypes.contains(e.dataType) &&
      e.references.nonEmpty && nodesOk(e)
  }

  /** Normalize a conjunct to `(low ≤/< high, strict)` over two bound
    * expressions. */
  private def asLe(e: Expression): Option[(Expression, Expression, Boolean)] =
    e match {
      case LessThanOrEqual(a, b) if isBoundExpr(a) && isBoundExpr(b) =>
        Some((a, b, false))
      case GreaterThanOrEqual(a, b) if isBoundExpr(a) && isBoundExpr(b) =>
        Some((b, a, false))
      case LessThan(a, b) if isBoundExpr(a) && isBoundExpr(b) =>
        Some((a, b, true))
      case GreaterThan(a, b) if isBoundExpr(a) && isBoundExpr(b) =>
        Some((b, a, true))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), JoinHint.NONE) =>
      val conjuncts = splitConjunctivePredicates(cond)
      def sideOf(a: Attribute): Int =
        if (left.outputSet.contains(a)) 0
        else if (right.outputSet.contains(a)) 1 else -1
      def exprSide(e: Expression): Int = {
        val sides = e.references.toSeq.map(sideOf).distinct
        if (sides == Seq(0)) 0 else if (sides == Seq(1)) 1 else -1
      }
      val equi = conjuncts.collect {
        case EqualTo(a: AttributeReference, b: AttributeReference)
            if sideOf(a) == 0 && sideOf(b) == 1 => (a, b)
        case EqualTo(a: AttributeReference, b: AttributeReference)
            if sideOf(a) == 1 && sideOf(b) == 0 => (b, a)
      }
      val les = conjuncts.flatMap(c => asLe(c).map(c -> _))
      // l-side low <= r-side high conjuncts, and the reverse direction
      val lToR = les.collect { case (c, (lo, hi, strict))
        if exprSide(lo) == 0 && exprSide(hi) == 1 &&
          lo.dataType == hi.dataType => (c, lo, hi, strict) }
      val rToL = les.collect { case (c, (lo, hi, strict))
        if exprSide(lo) == 1 && exprSide(hi) == 0 &&
          lo.dataType == hi.dataType => (c, lo, hi, strict) }
      // engine-internal composed operators (RangeJoin's bucket
      // formulations, the salting/blocking family) join on
      // underscore-prefixed working columns — their plan shapes are
      // deliberate and pinned, so the rewrite leaves them alone
      val internalJoin = equi.exists { case (a, b) =>
        a.name.startsWith("_") || b.name.startsWith("_") }
      // float/double keys would be compared by raw bits in the execs
      // (-0.0 vs 0.0, NaN patterns) — NormalizeFloatingNumbers never
      // visits this node, so defer to the plain join's exact semantics
      def hasFloat(dt: DataType): Boolean = dt match {
        case FloatType | DoubleType => true
        case s: org.apache.spark.sql.types.StructType =>
          s.fields.exists(f => hasFloat(f.dataType))
        case a: org.apache.spark.sql.types.ArrayType => hasFloat(a.elementType)
        case m: org.apache.spark.sql.types.MapType =>
          hasFloat(m.keyType) || hasFloat(m.valueType)
        case _ => false
      }
      val floatKey = equi.exists { case (a, _) => hasFloat(a.dataType) }
      if (!internalJoin && !floatKey && equi.nonEmpty &&
          lToR.size == 1 && rToL.size == 1) {
        val (cLR, lStart, rEnd, strictLR) = lToR.head
        val (cRL, rStart, lEnd, strictRL) = rToL.head
        val equiExprs: Seq[Expression] = equi.map { case (a, b) =>
          EqualTo(a, b): Expression }
        // a strict conjunct re-applies on top of the relaxed node
        val residual = conjuncts.filterNot(c =>
          (c eq cLR) || (c eq cRL) ||
            equiExprs.exists(_ semanticEquals c)) ++
          Seq(cLR).filter(_ => strictLR) ++ Seq(cRL).filter(_ => strictRL)
        // computed bounds become working columns under the node
        def boundAttr(e: Expression, tag: String,
            pending: scala.collection.mutable.Buffer[NamedExpression])
            : Attribute = e match {
          case a: AttributeReference => a
          case other =>
            val al = Alias(other, s"_gr_iv_$tag")()
            pending += al
            al.toAttribute
        }
        val lWork = scala.collection.mutable.Buffer.empty[NamedExpression]
        val rWork = scala.collection.mutable.Buffer.empty[NamedExpression]
        val lStartA = boundAttr(lStart, "ls", lWork)
        val lEndA = boundAttr(lEnd, "le", lWork)
        val rStartA = boundAttr(rStart, "rs", rWork)
        val rEndA = boundAttr(rEnd, "re", rWork)
        def guarded(child: LogicalPlan, keys: Seq[Attribute],
            bounds: Seq[Expression],
            work: Seq[NamedExpression]): LogicalPlan = {
          val refs = (keys ++ bounds.flatMap(_.references)).distinct
          val g = Filter(refs.map(IsNotNull(_): Expression).reduce(And(_, _)),
            child)
          if (work.isEmpty) g
          else Project(child.output ++ work, g)
        }
        val lChild = guarded(left, equi.map(_._1), Seq(lStart, lEnd),
          lWork.toSeq)
        val rChild = guarded(right, equi.map(_._2), Seq(rStart, rEnd),
          rWork.toSeq)
        val node = IntervalJoinNode(lChild, rChild,
          equi.map(_._1), equi.map(_._2),
          lStartA, lEndA, rStartA, rEndA,
          broadcastRight = None, relationalSemantics = true)
        val filtered =
          if (residual.isEmpty) node
          else Filter(residual.reduce(And(_, _)), node)
        // drop the working bound columns: parent plans resolved against
        // the original join output
        if (lWork.isEmpty && rWork.isEmpty) filtered
        else Project(j.output, filtered)
      } else j
  }
}
