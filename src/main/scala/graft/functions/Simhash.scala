package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass multi-block SimHash kernel.
  *
  * Semantics are IDENTICAL to the declarative chain it replaces
  * (`Dedup.saltedTokenHashes(toks, s)` → `Dedup.simhash16FromHashes`)
  * and therefore to the DuckDB oracle SQL:
  *   h(s, w)  = first 8 hex chars of md5("s" ++ s ++ w) as unsigned 32-bit
  *   bit j of block s set  iff  Σ_tokens ((h >> j & 1)·2 − 1) > 0
  *
  * Why a kernel: each block's 16 bit sums are separate interpreted
  * `aggregate` HOFs, and with 4 salts that is 64 interpreted array walks
  * per row (and, if the hash arrays are ever re-inlined by
  * CollapseProject, 64 full md5 passes — the measured 25 s version of
  * `ext_dedup_simhash_near`). This computes all 4 blocks with ONE md5
  * per (salt, token) in a single pass. CodegenFallback for the same
  * executor-classloader reason as [[ShingleMinhash]].
  */
object SimhashKernel {

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def baseHash(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(s.getBytes)
    ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) | ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
  }

  def simhashBlocks(toks: ArrayData, nBlocks: Int): ArrayData = {
    val m = toks.numElements()
    val out = new Array[Long](nBlocks)
    var s = 0
    while (s < nBlocks) {
      val prefix = UTF8String.fromString("s" + s)
      val sums = new Array[Int](16)
      var i = 0
      while (i < m) {
        val h = baseHash(UTF8String.concat(prefix, toks.getUTF8String(i)))
        var j = 0
        while (j < 16) {
          sums(j) += ((h >> j) & 1L).toInt * 2 - 1
          j += 1
        }
        i += 1
      }
      var sig = 0L
      var j = 0
      while (j < 16) { if (sums(j) > 0) sig |= 1L << j; j += 1 }
      out(s) = sig
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** `array<string>` tokens → `array<long>` of `nBlocks` salted 16-bit
  * SimHash blocks, one md5 per (salt, token). Null-propagates on null
  * token arrays (callers coalesce text upstream, as with
  * [[ShingleMinhash]]). */
case class SimhashBlocks(child: Expression, nBlocks: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    SimhashKernel.simhashBlocks(v.asInstanceOf[ArrayData], nBlocks)
  override protected def withNewChildInternal(c: Expression): SimhashBlocks = copy(c)
  override def prettyName: String = "simhash_blocks"
}

object SimhashBlocks {
  import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpr}
  def apply(toks: Column, nBlocks: Int): Column =
    toColumn(SimhashBlocks(toExpr(toks), nBlocks))
}
