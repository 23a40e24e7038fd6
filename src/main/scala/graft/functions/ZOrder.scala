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

  /** 3-D Morton interleave — x in positions 3i, y in 3i+1, z in 3i+2;
    * the bit-interleave baseline the 3-D Hilbert curve is measured
    * against (same grid, same index width). */
  def zvalue3(x: Long, y: Long, z: Long, bits: Int): Long = {
    var v = 0L
    var i = 0
    while (i < bits) {
      v |= ((x >>> i) & 1L) << (3 * i)
      v |= ((y >>> i) & 1L) << (3 * i + 1)
      v |= ((z >>> i) & 1L) << (3 * i + 2)
      i += 1
    }
    v
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

/** 3-D HILBERT curve kernel — Skilling's transpose algorithm
  * ("Programming the Hilbert curve", AIP Conf. Proc. 707, 2004; the
  * published n-dimensional form, here fixed at n = 3): axes →
  * transposed Hilbert via per-level reflect/exchange, Gray encode,
  * then bit-interleave the transpose into the curve index. Training-
  * data layouts cluster on THREE keys at once (source, lang, quality
  * bucket) — a 2-D curve forces one of them out of the clustering; the
  * 3-D curve keeps all three, with the same bijectivity + unit-step
  * adjacency guarantees (spec-pinned over the full cube). Pure integer
  * arithmetic, identically replayable in SQL. */
object Hilbert3Kernel {
  def xyz2d(bits: Int, x0: Long, y0: Long, z0: Long): Long = {
    val mask = (1L << bits) - 1
    val X = Array(x0 & mask, y0 & mask, z0 & mask)
    val m = 1L << (bits - 1)
    // inverse undo: reflect/exchange each level against axis 0
    var q = m
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < 3) {
        if ((X(i) & q) != 0) X(0) ^= p
        else { val t = (X(0) ^ X(i)) & p; X(0) ^= t; X(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    X(1) ^= X(0); X(2) ^= X(1)
    var t = 0L
    q = m
    while (q > 1) { if ((X(2) & q) != 0) t ^= q - 1; q >>= 1 }
    X(0) ^= t; X(1) ^= t; X(2) ^= t
    // transpose → index: bit j of X(i) lands at position 3j + (2 - i)
    var h = 0L
    var j = bits - 1
    while (j >= 0) {
      var i = 0
      while (i < 3) { h = (h << 1) | ((X(i) >>> j) & 1L); i += 1 }
      j -= 1
    }
    h
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

/** Codegen 3-D Hilbert distance of three long columns (coordinates are
  * masked to `bits` inside the kernel; index spans 3·bits bits). */
case class HilbertD3(first: Expression, second: Expression,
    third: Expression, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  require(bits > 0 && bits <= 20, s"bits must be in 1..20, got $bits")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(x: Any, y: Any, z: Any): Any =
    Hilbert3Kernel.xyz2d(bits,
      x.asInstanceOf[Long], y.asInstanceOf[Long], z.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"graft.functions.Hilbert3Kernel.xyz2d($bits, $a, $b, $c)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): HilbertD3 = copy(f, s, t)
  override def prettyName: String = "hilbert_d3"
}

/** Codegen 3-D z-value of three long columns (caller masks to `bits`
  * first — out-of-range high bits are ignored by construction). */
case class ZValue3(first: Expression, second: Expression,
    third: Expression, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  require(bits > 0 && bits <= 20, s"bits must be in 1..20, got $bits")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(x: Any, y: Any, z: Any): Any =
    ZOrderKernel.zvalue3(x.asInstanceOf[Long], y.asInstanceOf[Long],
      z.asInstanceOf[Long], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"graft.functions.ZOrderKernel.zvalue3($a, $b, $c, $bits)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): ZValue3 = copy(f, s, t)
  override def prettyName: String = "zvalue3"
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
