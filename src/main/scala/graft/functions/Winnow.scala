package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass winnowing kernel (Schleimer et al., SIGMOD'03 — MOSS).
  *
  * Semantics are IDENTICAL to the declarative HOF chain it replaces and
  * to the DuckDB oracle SQL (`fingerprintWinnowSql` in ExtQueries):
  *   t        = lower(text)                      (code-point k-grams)
  *   hash_i   = first 8 hex chars of md5(substr(t, i, k)) as unsigned 32-bit
  *   nWins    = nGrams − w + 1
  *   result   = sort(distinct(min of each w-window))   [nGrams ≥ w]
  *            = [global min]                           [0 < nGrams < w]
  *            = []                                     [nGrams ≤ 0]
  *
  * Why a kernel: the HOF formulation
  * (`transform(sequence(...), j -> array_min(slice(hs, j, w)))`) runs
  * interpreted, and interpreted lambdas get NO common-subexpression
  * elimination — every window element re-evaluated the full `hs` gram-hash
  * build, itself O(len²) because UTF8String.substring re-scans from the
  * string head per gram. Net O(len³) with an md5 per gram PER WINDOW: a
  * single sf0.1 verify task sat at 100% CPU for 25+ minutes. This kernel
  * walks the UTF-8 bytes once (explicit code-point offsets), md5s each
  * gram once, and takes window minima with a monotonic deque — O(len)
  * md5s + O(len) min work per row, at scan speed.
  */
object WinnowKernel {

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val Empty = new GenericArrayData(Array.emptyLongArray)

  def winnow(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val bytes = text.toLowerCase.getBytes
    val nBytes = bytes.length
    // code-point start offsets: gram i spans bytes [offs(i), offs(i+k))
    val offs = new Array[Int](nBytes + 1)
    var nChars = 0
    var p = 0
    while (p < nBytes) {
      offs(nChars) = p
      p += UTF8String.numBytesForFirstByte(bytes(p))
      nChars += 1
    }
    offs(nChars) = nBytes
    val nGrams = nChars - k + 1
    if (nGrams <= 0) return Empty

    val d = md.get()
    val hs = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      d.reset()
      d.update(bytes, offs(i), offs(i + k) - offs(i))
      val h = d.digest()
      hs(i) = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
        ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
      i += 1
    }

    val nWins = nGrams - w + 1
    if (nWins <= 0) {
      var mn = Long.MaxValue
      var j = 0
      while (j < nGrams) { if (hs(j) < mn) mn = hs(j); j += 1 }
      return new GenericArrayData(Array(mn))
    }

    // monotonic deque of indices: front always holds the window min
    val sel = new java.util.TreeSet[java.lang.Long]()
    val dq = new Array[Int](nGrams)
    var head = 0
    var tail = 0
    var j = 0
    while (j < nGrams) {
      while (tail > head && hs(dq(tail - 1)) >= hs(j)) tail -= 1
      dq(tail) = j
      tail += 1
      if (dq(head) <= j - w) head += 1
      if (j >= w - 1) sel.add(hs(dq(head)))
      j += 1
    }
    val out = new Array[Long](sel.size)
    val it = sel.iterator()
    var q = 0
    while (it.hasNext) { out(q) = it.next(); q += 1 }
    new GenericArrayData(out)
  }
}

/** Winnowing fingerprint as a custom Catalyst expression: string →
  * array<long> of the sorted distinct window-min k-gram hashes.
  *
  * Null-propagates (UnaryExpression); [[graft.ext.TextStats.winnowFingerprints]]
  * coalesces text to "" upstream so engine and oracle agree on null rows.
  *
  * [[CodegenFallback]] for the same reason as [[ShingleMinhash]]: the
  * per-row work is one kernel call, and generated Java referencing an
  * application class can stall executor-side Janino compiles through the
  * artifact class loader. */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  // misuse must fail at construction, not corrupt the kernel: w <= 0
  // would advance the deque head past the tail (stale-slot garbage
  // fingerprints), k <= 0 would throw inside MessageDigest.update
  require(k >= 1 && w >= 1, s"winnow_fingerprint requires k >= 1 and w >= 1, got k=$k w=$w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    WinnowKernel.winnow(v.asInstanceOf[UTF8String], k, w)
  override protected def withNewChildInternal(c: Expression): WinnowFingerprint = copy(c)
  override def prettyName: String = "winnow_fingerprint"
}

object WinnowFingerprint {
  import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpr}
  def apply(text: Column, k: Int, w: Int): Column =
    toColumn(WinnowFingerprint(toExpr(text), k, w))
}
