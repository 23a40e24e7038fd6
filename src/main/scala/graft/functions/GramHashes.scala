package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word-k-gram hash kernel: token array → array of md5 hex
  * strings, one per gram position (gram i = tokens[i..i+k-1] joined by
  * single spaces — byte-identical to
  * `md5(concat_ws(' ', ...)::binary)`, so the DuckDB oracle reproduces
  * every hash).
  *
  * Why a kernel: the declarative pipeline (zip_with fold → per-gram
  * concat_ws → md5) allocates a fresh gram STRING per position and runs
  * its array passes interpreted — ~1.4 s for the sf0.1 spans gram scan.
  * The kernel grabs each token's bytes once and feeds them straight into
  * one MessageDigest per gram (a space byte between tokens), no
  * intermediate gram strings, no lambdas — the same
  * no-interpreted-HOF-in-the-hot-path discipline as [[WinnowKernel]].
  *
  * Input tokens must be non-null elements (the `tokens()` splitter never
  * produces nulls); empty tokens participate with zero bytes, exactly as
  * concat_ws joins them. */
object GramHashKernel {

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val Empty = new GenericArrayData(new Array[AnyRef](0))
  private val HexDigits = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): UTF8String = {
    val out = new Array[Byte](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = HexDigits((bytes(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexDigits(bytes(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def gramHashes(toks: ArrayData, k: Int): GenericArrayData = {
    val n = toks.numElements()
    val nGrams = n - k + 1
    if (nGrams <= 0) return Empty
    val tb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { tb(i) = toks.getUTF8String(i).getBytes; i += 1 }
    val d = md.get()
    val out = new Array[AnyRef](nGrams)
    var g = 0
    while (g < nGrams) {
      d.reset()
      var j = 0
      while (j < k) {
        if (j > 0) d.update(' '.toByte)
        d.update(tb(g + j))
        j += 1
      }
      out(g) = hex(d.digest())
      g += 1
    }
    new GenericArrayData(out)
  }
}

/** Gram hashing as a custom Catalyst expression: array<string> tokens →
  * array<string> md5 hex per k-gram position. [[CodegenFallback]] for
  * the same reason as [[ShingleMinhash]]/[[WinnowFingerprint]]: one
  * kernel call per row, and generated Java referencing an application
  * class can stall executor-side Janino compiles. */
case class GramHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, s"gram_hashes requires k >= 1, got k=$k")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    GramHashKernel.gramHashes(v.asInstanceOf[ArrayData], k)
  override protected def withNewChildInternal(c: Expression): GramHashes = copy(c)
  override def prettyName: String = "gram_hashes"
}

object GramHashes {
  import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpr}
  def apply(toks: Column, k: Int): Column =
    toColumn(GramHashes(toExpr(toks), k))
}
