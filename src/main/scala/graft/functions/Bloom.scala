package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType}

/** Bloom-filter kernel shared by the build and probe sides of
  * [[graft.ops.BloomJoin]].
  *
  * Bit positions use Kirsch–Mitzenmacher double hashing (two derived
  * 64-bit hashes simulate k independent ones without loss for Bloom
  * filters — Kirsch & Mitzenmacher, ESA'06): position_i =
  * (h + i·h2) mod m with h2 = splitmix64(h) | 1 (odd stride so the walk
  * covers all residues). The probe expression and the build explode call
  * THIS class for every position, so the two sides can never disagree on
  * the hash chain.
  */
object BloomUtil {

  /** splitmix64 finalizer (Steele et al., public domain) — full-avalanche
    * 64-bit mix; wrapping Java arithmetic by design. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def pos(h1: Long, h2: Long, i: Int, mBits: Int): Int = {
    val p = (h1 + i.toLong * h2) % mBits
    (if (p < 0) p + mBits else p).toInt
  }

  /** All k bit positions for hash `h` in an m-bit filter (build side). */
  def positions(h: Long, k: Int, mBits: Int): GenericArrayData = {
    val h2 = mix(h) | 1L
    val out = new Array[Int](k)
    var i = 0
    while (i < k) { out(i) = pos(h, h2, i, mBits); i += 1 }
    new GenericArrayData(out)
  }

  /** Probe: true iff every one of the k positions is set in `bits`. */
  def contains(bits: Array[Long], h: Long, k: Int): Boolean = {
    val mBits = bits.length * 64
    val h2 = mix(h) | 1L
    var i = 0
    while (i < k) {
      val p = pos(h, h2, i, mBits)
      if ((bits(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Build-side generator: 64-bit key hash → array of the k bit positions
  * to set. Explode + groupBy(word) + bit_or turns this into a fully
  * relational, map-side-combined filter build (the shuffle is at most
  * m/64 words, kilobytes, regardless of input size). */
case class BloomPositions(child: Expression, k: Int, mBits: Int)
    extends UnaryExpression {
  require(k > 0 && mBits > 0 && mBits % 64 == 0,
    s"need k>0 and mBits a positive multiple of 64, got k=$k mBits=$mBits")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(h: Any): Any =
    BloomUtil.positions(h.asInstanceOf[Long], k, mBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BloomUtil.positions($c, $k, $mBits)")
  override protected def withNewChildInternal(c: Expression): BloomPositions = copy(c)
  override def prettyName: String = "bloom_positions"
}

/** Probe-side predicate: true iff the key hash MIGHT be in the filter.
  * The bitset rides along as a codegen reference object — it is shipped
  * inside the (torrent-broadcast) task binary once per executor, not
  * per row or per task payload. Stays inside whole-stage codegen, so a
  * 100-TB scan pays one static call per row. */
case class BloomContains(child: Expression, bits: Array[Long], k: Int)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(h: Any): Any =
    BloomUtil.contains(bits, h.asInstanceOf[Long], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBits", bits, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.BloomUtil.contains($ref, $c, $k)")
  }
  override protected def withNewChildInternal(c: Expression): BloomContains = copy(c)
  override def prettyName: String = "bloom_contains"
}
