package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Abs, And, Expression, GreaterThan, GreaterThanOrEqual, Length, LessThan, LessThanOrEqual, Levenshtein, Literal, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: a thresholded edit-distance predicate
  * `levenshtein(a, b) <= k` rewrites to
  *
  * {{{ abs(length(a) - length(b)) <= k AND levenshtein(a, b, k) >= 0 }}}
  *
  * Two independent wins, both per-row and codegen-friendly:
  *
  *  1. `|len(a) - len(b)| <= k` is a NECESSARY condition for edit distance
  *     (each edit changes the length by at most 1). `And` short-circuits in
  *     codegen, so mismatched-length pairs — the vast majority in a blocked
  *     fuzzy join — never run the DP at all.
  *  2. The surviving pairs run Spark's banded 3-arg levenshtein, which
  *     abandons a row as soon as every cell of a DP diagonal exceeds the
  *     threshold: O(k·min(m,n)) instead of O(m·n) — the difference between
  *     feasible and not on long strings at 100 TB pair counts.
  *
  * Null semantics are preserved: every introduced expression is
  * null-intolerant, so a null on either side yields null exactly like the
  * original predicate. Only 2-arg `Levenshtein` against an INT literal is
  * matched (the rewritten form carries a threshold, so the rule is
  * idempotent); `lev < k` enters as `lev <= k-1`.
  *
  * Injected via [[graft.GraftExtensions]] (`injectOptimizerRule`), so SQL
  * and DataFrame users writing the naive predicate get the banded plan for
  * free.
  */
object LevenshteinBandRewrite extends Rule[LogicalPlan] {

  private def banded(a: Expression, b: Expression, k: Int): Expression =
    And(
      LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), Literal(k)),
      GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(k))), Literal(0)))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType)) if k >= 0 =>
        banded(a, b, k)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None)) if k >= 0 =>
        banded(a, b, k)
      case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType)) if k >= 1 =>
        banded(a, b, k - 1)
      case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None)) if k >= 1 =>
        banded(a, b, k - 1)
    }
}
