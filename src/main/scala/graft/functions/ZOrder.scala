package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) curve kernel: interleave the low `bits` bits of two
  * non-negative coordinates — x in the even output positions, y in the
  * odd. Sorting by the z-value clusters rows that are close in BOTH
  * dimensions into the same file/row-group, so min/max footer stats
  * prune scans for predicates on EITHER column (the lakehouse
  * multi-dimensional clustering technique, e.g. Delta/Iceberg
  * `OPTIMIZE ZORDER BY`). Pure bit arithmetic — any engine reproduces
  * it, which is what lets the DuckDB oracle verify the curve itself. */
object ZOrderKernel {
  def zvalue(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >>> i) & 1L) << (2 * i)
      z |= ((y >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}

/** HILBERT curve kernel: map a 2-D point on the 2^bits × 2^bits grid to
  * its distance along the Hilbert curve (Hilbert 1891; xy→d iteration
  * as published in the public "Hilbert curve" literature/Wikipedia
  * form). Hilbert ordering clusters strictly better than Morton — the
  * curve never makes Morton's long diagonal jumps, so consecutive curve
  * positions are ALWAYS grid neighbors and file min/max ranges cover
  * tighter rectangles (the reason newer table formats offer Hilbert
  * next to z-order). Pure integer arithmetic, identically replayable in
  * SQL — the DuckDB oracle unrolls the same per-level rotation. */
object HilbertKernel {
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    var x = x0 & (n - 1)
    var y = y0 & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the quadrant so the sub-curve enters/exits correctly
      if (ry == 0L) {
        if (rx == 1L) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** Codegen Hilbert distance of two long columns (coordinates are masked
  * to `bits` inside the kernel). */
case class HilbertD(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits > 0 && bits <= 31, s"bits must be in 1..31, got $bits")
  override def dataType: DataType = LongType
  override def nullSafeEval(x: Any, y: Any): Any =
    HilbertKernel.xy2d(bits, x.asInstanceOf[Long], y.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HilbertKernel.xy2d($bits, $a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HilbertD =
    copy(l, r)
  override def prettyName: String = "hilbert_d"
}

/** Codegen z-value of two long columns (caller masks to `bits` first —
  * out-of-range high bits are ignored by construction). */
case class ZValue(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits > 0 && bits <= 31, s"bits must be in 1..31, got $bits")
  override def dataType: DataType = LongType
  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrderKernel.zvalue(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrderKernel.zvalue($a, $b, $bits)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZValue =
    copy(l, r)
  override def prettyName: String = "zvalue"
}
