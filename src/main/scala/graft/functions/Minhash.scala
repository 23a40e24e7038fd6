package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash kernel invoked from generated code.
  *
  * Semantics are IDENTICAL to the declarative chain it replaces
  * (`Dedup.shingles` → `Dedup.shingleHashes` → k× `Dedup.minhashComponent`),
  * and therefore to the DuckDB oracle SQL in ExtQueries:
  *   shingle_i   = toks[i] ++ " " ++ ... ++ toks[i+n-1]   (or the single
  *                 whole-document join when |toks| < n)
  *   base hash x = first 8 hex chars of md5(shingle) as unsigned 32-bit
  *   sig_j       = min over shingles of (x·a_j + b_j) mod p
  *
  * Why a kernel instead of the HOF chain: `transform`/`array_min` run
  * interpreted (outside whole-stage codegen and its common-subexpression
  * elimination), so each of the k components re-walked the shingle array
  * through a separate interpreted pass, and every REFERENCE to a derived
  * array column re-evaluated its whole lineage — forcing four persist
  * barriers in `Dedup.minhashLsh` just to pin evaluation counts. This
  * expression computes the distinct shingle set and all k minima in ONE
  * pass per row (one md5 per shingle), participates in codegen, and needs
  * no barrier at all.
  */
object MinhashKernel {

  /** Smallest prime above 2^32; a < 2^20 keeps a·x+b < 2^52 (no overflow). */
  val Prime = 4294967311L
  val SaltA: Array[Long] = Array(1000003L, 999983L, 31337L, 999979L, 65537L, 524287L)
  val SaltB: Array[Long] = Array(17L, 29L, 71L, 101L, 131L, 151L)

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val Space = UTF8String.fromString(" ")

  /** md5-derived unsigned 32-bit base hash of one shingle — identical to
    * `conv(substring(md5(s), 1, 8), 16, 10)`: the first 8 hex chars of the
    * digest are its first 4 bytes, big-endian. */
  private def baseHash(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(s.getBytes)
    ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) | ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
  }

  /** Distinct shingle set (first-occurrence order, = array_distinct) and
    * the k-component signature, as one struct row. */
  def shingleMinhash(toks: ArrayData, n: Int, k: Int): InternalRow = {
    val m = toks.numElements()
    val nShingles = if (m >= n) m - n + 1 else 1
    val shingles = new Array[UTF8String](nShingles)
    if (m >= n) {
      var i = 0
      while (i < nShingles) {
        val parts = new Array[UTF8String](2 * n - 1)
        var j = 0
        while (j < n) {
          if (j > 0) parts(2 * j - 1) = Space
          parts(2 * j) = toks.getUTF8String(i + j)
          j += 1
        }
        shingles(i) = UTF8String.concat(parts: _*)
        i += 1
      }
    } else {
      // whole-document fallback: concat_ws(" ", toks) — skips nulls
      val parts = new Array[UTF8String](m)
      var i = 0
      while (i < m) { parts(i) = toks.getUTF8String(i); i += 1 }
      shingles(0) = UTF8String.concatWs(Space, parts: _*)
    }

    val seen = new java.util.LinkedHashSet[UTF8String](nShingles * 2)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < nShingles) {
      val s = shingles(i)
      if (seen.add(s)) {
        // duplicate shingles can't change any min — hash only fresh ones
        val x = baseHash(s)
        var j = 0
        while (j < k) {
          val v = (x * SaltA(j) + SaltB(j)) % Prime
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    val sset = new Array[AnyRef](seen.size)
    seen.toArray(sset)
    InternalRow(new GenericArrayData(sset), new GenericArrayData(mins))
  }
}

/** MinHash shingle signature as a custom Catalyst expression (SURVEY
  * §4.3.2): array<string> tokens → struct<sset: array<string>,
  * sig: array<long>> in one pass. See [[MinhashKernel]] for why this
  * beats the higher-order-function formulation.
  *
  * Null handling: as a UnaryExpression this null-propagates (null tokens
  * → null struct), which DIVERGES from the declarative chain it replaced
  * (signature over [""]). Callers in [[graft.ext.Dedup]] coalesce text
  * to "" upstream so kernel, declarative chain, and the DuckDB oracle
  * agree on null input.
  *
  * Deliberately [[CodegenFallback]], NOT `defineCodeGen` calling the
  * kernel: generated Java that references an application class forces the
  * executor-side Janino compile to resolve that symbol through the
  * session-artifact class loader, which fetches candidate class bytes
  * over the driver's RPC file channel — observed to stall whole-stage
  * compilation for minutes (and once wedge a run outright) under a busy
  * local[32] JVM. All per-row work happens inside the one kernel call, so
  * interpreted dispatch of this single expression costs nothing
  * measurable; the surrounding projection still codegens. */
case class ShingleMinhash(child: Expression, n: Int, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("sset", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("sig", ArrayType(LongType, containsNull = false), nullable = false)))
  override def nullSafeEval(v: Any): Any =
    MinhashKernel.shingleMinhash(v.asInstanceOf[ArrayData], n, k)
  override protected def withNewChildInternal(c: Expression): ShingleMinhash = copy(c)
  override def prettyName: String = "shingle_minhash"
}

object ShingleMinhash {
  import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpr}
  def apply(toks: Column, n: Int, k: Int): Column =
    toColumn(ShingleMinhash(toExpr(toks), n, k))
}
