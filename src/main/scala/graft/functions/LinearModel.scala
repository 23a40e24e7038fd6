package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Hashing-trick linear-model scoring kernel (the fastText/DCLM-style
  * model-based quality-filter shape): token → feature bucket via the
  * hashing trick (Weinberger et al., ICML'09), bucket → integer weight
  * from a broadcast weight table, document score = Σ weights.
  *
  * Everything is integer and md5-derived so the DuckDB oracle reproduces
  * every score bit-for-bit:
  *   bucket(w)  = md5u32(w) mod dim          (first 4 digest bytes,
  *                big-endian — the `('0x'||substr(md5(w),1,8))::BIGINT`
  *                convention every other hash op here uses)
  *   weight(b)  = md5u32(str(b)) mod 2001 − 1000   ∈ [−1000, 1000]
  * A production deployment swaps [[weights]] for trained parameters;
  * the ENGINE shape is identical — the model rides to executors as a
  * codegen reference object inside the broadcast task binary, scoring
  * is one narrow codegen pass, no join, no shuffle.
  */
object LinearModelKernel {

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def md5u32(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(bytes)
    ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
  }

  /** The deterministic stand-in weight table (see class doc). */
  def buildWeights(dim: Int): Array[Int] = {
    val out = new Array[Int](dim)
    var b = 0
    while (b < dim) {
      out(b) = (md5u32(String.valueOf(b).getBytes("UTF-8")) % 2001L).toInt - 1000
      b += 1
    }
    out
  }

  /** Σ over tokens of weights(bucket(token)) — one md5 per token. */
  def scoreSum(toks: ArrayData, weights: Array[Int]): Long = {
    val n = toks.numElements()
    val dim = weights.length
    var sum = 0L
    var i = 0
    while (i < n) {
      sum += weights((md5u32(toks.getUTF8String(i).getBytes) % dim).toInt)
      i += 1
    }
    sum
  }
}

/** array<string> tokens → long Σ-weight, inside whole-stage codegen;
  * the weight table ships once per executor as a reference object. */
case class HashedLinearScore(child: Expression, weights: Array[Int])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(toks: Any): Any =
    LinearModelKernel.scoreSum(toks.asInstanceOf[ArrayData], weights)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("modelWeights", weights, "int[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.LinearModelKernel.scoreSum($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): HashedLinearScore = copy(c)
  override def prettyName: String = "hashed_linear_score"
}
