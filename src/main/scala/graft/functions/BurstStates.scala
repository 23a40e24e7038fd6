package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Two-state burst segmentation of a count series by integer VITERBI —
  * the discrete-cost analog of Kleinberg's burst automaton (KDD 2002):
  * state 0 emits around the baseline level μ₀, state 1 around the burst
  * level μ₁ = 2μ₀+1, emission cost = L1 distance |c − μ_s| (integers —
  * no Poisson logs, so any engine replays the DP bit-for-bit), plus a
  * switch penalty γ per transition. The minimum-cost state path marks
  * WHICH days belong to a sustained burst — a single spike cheaper to
  * absorb than two switches stays state 0, which is exactly the
  * smoothing a per-day threshold can't do.
  *
  * Tie rules (part of the contract, mirrored in the SQL oracle):
  * arriving ties prefer NOT switching (stay-cost ≤ switch-cost wins),
  * the final-state tie prefers 0.
  */
object BurstKernel {
  def viterbi(cs: Array[Long], mu0: Long, gamma: Long): Array[Int] = {
    val n = cs.length
    if (n == 0) return Array.empty
    val mu1 = 2 * mu0 + 1
    val bp0 = new Array[Int](n)
    val bp1 = new Array[Int](n)
    var c0 = math.abs(cs(0) - mu0)
    var c1 = math.abs(cs(0) - mu1)
    var t = 1
    while (t < n) {
      val e0 = math.abs(cs(t) - mu0)
      val e1 = math.abs(cs(t) - mu1)
      val n0 = if (c0 <= c1 + gamma) { bp0(t) = 0; c0 + e0 }
               else { bp0(t) = 1; c1 + gamma + e0 }
      val n1 = if (c1 <= c0 + gamma) { bp1(t) = 1; c1 + e1 }
               else { bp1(t) = 0; c0 + gamma + e1 }
      c0 = n0; c1 = n1
      t += 1
    }
    val states = new Array[Int](n)
    states(n - 1) = if (c0 <= c1) 0 else 1
    var i = n - 1
    while (i > 0) {
      states(i - 1) = if (states(i) == 0) bp0(i) else bp1(i)
      i -= 1
    }
    states
  }
}

/** POOL-ADJACENT-VIOLATORS isotonic regression (Ayer et al. 1955;
  * Zadrozny & Elkan 2002 for classifier calibration) over pre-bucketed
  * binomial counts: given per-bucket (successes k, totals n) in score
  * order, pool adjacent buckets while a LEFT block's rate strictly
  * exceeds its right neighbor's, yielding the least-squares monotone
  * non-decreasing fit. Rates compare CROSS-MULTIPLIED (k₁·n₂ > k₂·n₁)
  * — exact integers, no division until the final q4 rendering, so any
  * engine replays every merge decision bit-for-bit. */
object PavKernel {
  /** Per-bucket isotonic rate in basis points, aligned to the input. */
  def isotonicBp(ks: Array[Long], ns: Array[Long]): Array[Long] = {
    require(ks.length == ns.length, "k/n arrays must align")
    val st = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    var i = 0
    while (i < ks.length) {
      var k = ks(i); var n = ns(i); var cnt = 1
      // merge while the previous block's rate strictly exceeds ours
      while (st.nonEmpty && st.last._1 * n > k * st.last._2) {
        val (pk, pn, pc) = st.remove(st.length - 1)
        k += pk; n += pn; cnt += pc
      }
      st.append((k, n, cnt))
      i += 1
    }
    val out = new Array[Long](ks.length)
    var pos = 0
    st.foreach { case (k, n, cnt) =>
      val bp = if (n == 0) 0L else (10000L * k) / n
      var j = 0
      while (j < cnt) { out(pos) = bp; pos += 1; j += 1 }
    }
    out
  }
}

/** Expression form: `PavRates(ks, ns)` over aligned `array<long>`
  * columns → `array<long>` isotonic rates in bp. Runs once per
  * calibration row on a bounded bucket array. */
case class PavRates(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override protected def nullSafeEval(ks: Any, ns: Any): Any =
    new GenericArrayData(PavKernel.isotonicBp(
      ks.asInstanceOf[ArrayData].toLongArray(),
      ns.asInstanceOf[ArrayData].toLongArray()))
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): PavRates = copy(l, r)
  override def prettyName: String = "pav_rates"
}

/** Expression form: `BurstStates(counts, mu0, gamma)` over an
  * `array<long>` count series → `array<int>` states. Runs ONCE PER
  * GROUP ROW on a bounded series array (the daily-series contract:
  * ≤ 366 elements per group-year), so interpreted eval is the right
  * cost point — no codegen needed for a per-group kernel. */
case class BurstStates(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def nullSafeEval(arr: Any, m0: Any, g: Any): Any = {
    val a = arr.asInstanceOf[ArrayData].toLongArray()
    new GenericArrayData(BurstKernel.viterbi(a,
      m0.asInstanceOf[Long], g.asInstanceOf[Long]))
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): BurstStates = copy(f, s, t)
  override def prettyName: String = "burst_states"
}
