package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact broadcast-set array filtering for stop-token removal
  * ([[graft.ext.Dedup.ngramJaccard]]'s df cap).
  *
  * Why not `array_except(col, typedLit(stop))`: a df-cap stop list is
  * bounded (≤100k tokens by pigeonhole) but NOT small — inlining it as a
  * literal puts every token in the logical/physical plan tree and the
  * generated code source, a plan-size and task-binary hazard at the
  * limit. Here the set rides as a codegen REFERENCE OBJECT (one hash set
  * shipped once inside the broadcast task binary, the
  * [[graft.functions.BloomContains]] bitset pattern), and the per-row
  * work stays inside whole-stage codegen as a single static call. */
object StopSetUtil {

  /** Driver-side build; UTF8String keys so probe-side comparison is the
    * same binary equality `array_except` uses. */
  def build(tokens: Array[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](math.max(16, tokens.length * 2))
    tokens.foreach(t => s.add(UTF8String.fromString(t)))
    s
  }

  /** `arr` minus the set, order-preserving (the input is already
    * distinct where [[graft.ext.Dedup.ngramJaccard]] calls this, so no
    * dedup pass — unlike `array_except`, which also dedups). */
  def except(arr: ArrayData, stop: java.util.HashSet[UTF8String]): ArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[AnyRef](n)
    var i = 0
    while (i < n) {
      val v = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      if (v == null || !stop.contains(v)) out.add(v)
      i += 1
    }
    new GenericArrayData(out.toArray())
  }
}

object ArrayExceptSet {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpr}
  def apply(arr: Column, stop: Array[String]): Column =
    toColumn(ArrayExceptSet(toExpr(arr), stop))
}

/** `child` (array<string>) with every element of `stop` removed; exact
  * set semantics, codegen via a reference object (never a plan literal). */
case class ArrayExceptSet(child: Expression, stop: Array[String])
    extends UnaryExpression {
  override def dataType: DataType = child.dataType match {
    case ArrayType(StringType, n) => ArrayType(StringType, n)
    case dt => throw new IllegalArgumentException(
      s"array_except_set needs array<string>, got $dt")
  }
  @transient private lazy val set = StopSetUtil.build(stop)
  override def nullSafeEval(a: Any): Any =
    StopSetUtil.except(a.asInstanceOf[ArrayData], set)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopSet", set, "java.util.HashSet")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.StopSetUtil.except($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): ArrayExceptSet =
    copy(child = c)
  override def prettyName: String = "array_except_set"
}
