package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity in EXACT basis points — the record-linkage
  * scorer (Winkler 1990, public) next to the edit-distance family
  * ([[FuzzRatio]], [[WRatioKernel]]) the reference's fuzzy passes use
  * (`/root/reference/create_sheets.py:36-60` ranks candidates with
  * thefuzz; Jaro–Winkler is the other classic name-matching scorer an
  * ER deployment reaches for).
  *
  * The whole computation is integer arithmetic on the Jaro counts
  * (matches `m`, doubled transpositions `t2`, lengths, common prefix),
  * so the result is `floor(jw * 10^4)` of the EXACT rational value —
  * engine-portable where a float pipeline is not:
  *
  *  - jaro = (m/l1 + m/l2 + (m - t2/2)/m) / 3
  *         = (2m²·l2 + 2m²·l1 + (2m - t2)·l1·l2) / (6·l1·l2·m)
  *  - prefix boost (only when jaro > 7/10, compared cross-multiplied):
  *    jw = jaro + L·0.1·(1 - jaro) = ((10-L)·num + L·den) / (10·den)
  *    with L = min(4, common prefix length)
  *  - m = 0 (incl. either side empty) → 0, matching DuckDB's
  *    `jaro_winkler_similarity` convention (both-empty is 0, not 1).
  *
  * The match window is `max(⌊max(l1,l2)/2⌋ - 1, 0)`; each right-side
  * character matches at most once, left-to-right greedy — the standard
  * published algorithm, which DuckDB (via rapidfuzz) implements
  * identically; the oracle gate cross-checks this kernel against that
  * independent native implementation on real data.
  *
  * O(l1·window) time, two boolean scratch arrays — cheap enough for the
  * codegen'd per-candidate hot loop of a blocked match join.
  */
object JaroWinklerKernel {

  def jaroWinklerBp(aU: UTF8String, bU: UTF8String): Int = {
    val a = aU.toString
    val b = bU.toString
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val aMatch = new Array[Boolean](l1)
    val bMatch = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true
          bMatch(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0
    // doubled transposition count: matched chars read off in order from
    // each side; every position where they differ contributes 1 (t = t2/2)
    var t2 = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t2 += 1
        k += 1
      }
      i += 1
    }
    val num = 2L * m * m * l2 + 2L * m * m * l1 + (2L * m - t2) * l1 * l2
    val den = 6L * l1 * l2 * m
    var prefix = 0
    while (prefix < 4 && prefix < l1 && prefix < l2 &&
      a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    // boost only when jaro > 0.7, compared exactly: 10·num > 7·den
    if (10L * num > 7L * den)
      ((10000L * ((10L - prefix) * num + prefix * den)) / (10L * den)).toInt
    else
      ((10000L * num) / den).toInt
  }
}

/** `jaro_winkler_bp(a, b)` as a codegen'd Catalyst expression (SURVEY
  * §2.9 ladder): exact-integer basis points of the Jaro–Winkler
  * similarity. Registered on the SQL surface by
  * [[graft.plans.GraftExtensions]]. */
case class JaroWinklerBp(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerKernel.jaroWinklerBp(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaroWinklerKernel.jaroWinklerBp($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinklerBp =
    copy(l, r)
  override def prettyName: String = "jaro_winkler_bp"
}
