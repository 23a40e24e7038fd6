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
