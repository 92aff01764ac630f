package graft.functions

import org.apache.spark.sql.catalyst.expressions.{
  Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual,
  Levenshtein, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite un-thresholded `levenshtein(a, b) ≤ k`
  * predicates into Spark's early-exit threshold form
  * `levenshtein(a, b, k) ≥ 0`.
  *
  * Full Levenshtein is O(|a|·|b|) per row; the threshold variant abandons
  * a row as soon as the distance provably exceeds k — O(k·min(|a|,|b|))
  * — and returns −1, so `≥ 0` is EXACTLY the original predicate
  * (distance ≤ k ⟺ thresholded distance ≥ 0; a null input yields null
  * under both forms, and a comparison on null stays null). At an
  * edit-distance join's verify step this is the difference between a
  * banded and a full dynamic-programming matrix on every candidate pair —
  * [[graft.operators.FuzzyJoin]] calls the threshold form directly; this
  * rule gives the same win to plain-SQL users who write the natural
  * predicate (the (c)-tier `SparkSessionExtensions` path: the semantics
  * exist, only the evaluation strategy changes — a planner concern, so it
  * lives in the optimizer, not in user code).
  *
  * Rewrites, for integer literal k (only non-negative k yields a
  * thresholded form; `lev < 0` folds to false-shaped arithmetic anyway):
  *   - `lev(a,b) <= k`  → `lev(a,b,k) >= 0`
  *   - `lev(a,b) <  k`  → `lev(a,b,k−1) >= 0`   (k ≥ 1)
  *   - `k >= lev(a,b)`, `k > lev(a,b)` — the mirrored forms likewise.
  * Strictly-greater bounds (`lev > k`, needing the exact distance of
  * far-apart strings) are left untouched — the threshold form cannot
  * express them.
  */
object LevenshteinRewrite extends Rule[LogicalPlan] {

  private def thresholded(lev: Levenshtein, k: Int): Expression =
    GreaterThanOrEqual(
      Levenshtein(lev.left, lev.right, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(lev @ Levenshtein(_, _, None),
          Literal(k: Int, IntegerType)) if k >= 0 =>
        thresholded(lev, k)
      case LessThan(lev @ Levenshtein(_, _, None),
          Literal(k: Int, IntegerType)) if k >= 1 =>
        thresholded(lev, k - 1)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType),
          lev @ Levenshtein(_, _, None)) if k >= 0 =>
        thresholded(lev, k)
      case GreaterThan(Literal(k: Int, IntegerType),
          lev @ Levenshtein(_, _, None)) if k >= 1 =>
        thresholded(lev, k - 1)
    }
}
