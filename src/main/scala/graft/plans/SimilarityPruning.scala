package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

import graft.functions.{DamerauLevenshtein, FuzzRatio, JaroWinklerBp}

/** Optimizer rule: derive cheap LENGTH prefilters from expensive fuzzy
  * string predicates — the classic similarity-join length filter
  * (Gravano et al. VLDB'01) as a Catalyst rewrite, so every query gets
  * it for free instead of each call site hand-adding the bound.
  *
  *  - `levenshtein(a, b) <= d` implies `abs(len(a) − len(b)) <= d`
  *    (each unit of length difference costs ≥ 1 edit), and
  *  - `fuzz_ratio(a, b) >= t` implies
  *    `400·least(len(a), len(b)) >= (2t−1)·(len(a)+len(b))`
  *    (indel distance ≥ |len(a)−len(b)|, ratio = round(100·(1 −
  *    dist∕(la+lb))); the −1 absorbs the half-up rounding slack).
  *
  * The implied conjunct is PREPENDED, so conjunct short-circuiting
  * evaluates the two length() calls before the O(|a|·|b|) DP kernel —
  * on a blocked candidate join most pairs die at the length gate. The
  * original predicate always stays (the bound is necessary, not
  * sufficient). Null semantics are preserved: null input makes both
  * the bound and the original predicate null → row filtered either way.
  *
  * Fires on Filter AND Join conditions (predicate pushdown may have
  * moved the fuzzy conjunct into the join residual by the time the
  * operator-optimization batch runs). Idempotent under the optimizer's
  * fixed-point driver: a bound already present (semantically) is never
  * added twice.
  *
  * Installed by [[GraftExtensions]] via `injectOptimizerRule` — config
  * `spark.sql.extensions=graft.plans.GraftExtensions` turns it on for
  * any session. */
object SimilarityPruning extends Rule[LogicalPlan] with PredicateHelper {

  private def len(e: Expression) = Length(e)

  private def levBound(a: Expression, b: Expression, d: Int): Expression =
    LessThanOrEqual(Abs(Subtract(len(a), len(b))), Literal(d))

  private def ratioBound(a: Expression, b: Expression, t: Int): Expression =
    GreaterThanOrEqual(
      Multiply(Literal(400), Least(Seq(len(a), len(b)))),
      Multiply(Literal(2 * t - 1), Add(len(a), len(b))))

  /** `jaro_winkler_bp(a, b) >= t` (basis points, t > 8000) implies
    * `2000·least(len) >= (t−8000)·greatest(len)`: bp ≥ t forces the
    * boosted branch (unboosted jaro ≤ 0.7 < t∕10⁴), the cap-4 boost
    * gives jw ≤ 0.6·jaro + 0.4, and jaro ≤ (min∕max + 2)∕3 since
    * matches m ≤ min(len); chaining the three yields the length-ratio
    * bound min∕max ≥ (t−8000)∕2000. For t ≤ 8000 the bound is vacuous
    * and is not added. */
  private def jwBound(a: Expression, b: Expression, t: Int): Expression =
    GreaterThanOrEqual(
      Multiply(Literal(2000), Least(Seq(len(a), len(b)))),
      Multiply(Literal(t - 8000), Greatest(Seq(len(a), len(b)))))

  /** The implied cheap bound for one conjunct, if it is a thresholded
    * fuzzy predicate (both operand orders; Levenshtein only in its
    * un-thresholded form — the 3-arg variant already prunes internally). */
  private def boundFor(e: Expression): Option[Expression] = e match {
    case LessThanOrEqual(Levenshtein(a, b, None), Literal(d: Int, IntegerType)) =>
      Some(levBound(a, b, d))
    case LessThan(Levenshtein(a, b, None), Literal(d: Int, IntegerType)) =>
      Some(levBound(a, b, d - 1))
    case GreaterThanOrEqual(Literal(d: Int, IntegerType), Levenshtein(a, b, None)) =>
      Some(levBound(a, b, d))
    case GreaterThan(Literal(d: Int, IntegerType), Levenshtein(a, b, None)) =>
      Some(levBound(a, b, d - 1))
    case GreaterThanOrEqual(FuzzRatio(a, b), Literal(t: Int, IntegerType)) =>
      Some(ratioBound(a, b, t))
    case GreaterThan(FuzzRatio(a, b), Literal(t: Int, IntegerType)) =>
      Some(ratioBound(a, b, t + 1))
    case LessThanOrEqual(Literal(t: Int, IntegerType), FuzzRatio(a, b)) =>
      Some(ratioBound(a, b, t))
    case LessThan(Literal(t: Int, IntegerType), FuzzRatio(a, b)) =>
      Some(ratioBound(a, b, t + 1))
    // Damerau–Levenshtein: transpositions never change length and every
    // other edit changes it by at most 1, so the Levenshtein length
    // bound holds unchanged.
    case LessThanOrEqual(DamerauLevenshtein(a, b), Literal(d: Int, IntegerType)) =>
      Some(levBound(a, b, d))
    case LessThan(DamerauLevenshtein(a, b), Literal(d: Int, IntegerType)) =>
      Some(levBound(a, b, d - 1))
    case GreaterThanOrEqual(Literal(d: Int, IntegerType), DamerauLevenshtein(a, b)) =>
      Some(levBound(a, b, d))
    case GreaterThan(Literal(d: Int, IntegerType), DamerauLevenshtein(a, b)) =>
      Some(levBound(a, b, d - 1))
    case GreaterThanOrEqual(JaroWinklerBp(a, b), Literal(t: Int, IntegerType)) if t > 8000 =>
      Some(jwBound(a, b, t))
    case GreaterThan(JaroWinklerBp(a, b), Literal(t: Int, IntegerType)) if t >= 8000 =>
      Some(jwBound(a, b, t + 1))
    case LessThanOrEqual(Literal(t: Int, IntegerType), JaroWinklerBp(a, b)) if t > 8000 =>
      Some(jwBound(a, b, t))
    case LessThan(Literal(t: Int, IntegerType), JaroWinklerBp(a, b)) if t >= 8000 =>
      Some(jwBound(a, b, t + 1))
    case _ => None
  }

  private def augment(cond: Expression): Option[Expression] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val fresh = conjuncts.flatMap(boundFor).distinct
      .filterNot(b => conjuncts.exists(_.semanticEquals(b)))
    if (fresh.isEmpty) None
    else Some(fresh.foldRight(cond)((b, acc) => And(b, acc)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      augment(cond).map(Filter(_, child)).getOrElse(f)
    case j @ Join(_, _, _, Some(cond), _) =>
      augment(cond).map(c => j.copy(condition = Some(c))).getOrElse(j)
  }
}
