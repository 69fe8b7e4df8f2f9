package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite a bounded edit-distance predicate
  * {{{ levenshtein(a, b) <= k }}}
  * into Spark's THRESHOLDED Levenshtein
  * {{{ levenshtein(a, b, k) >= 0 }}}
  * (the three-argument form returns the distance when it is ≤ k and −1
  * otherwise).
  *
  * The unbounded form fills the full O(|a|·|b|) dynamic-programming
  * matrix for every pair even when the predicate only needs "is it
  * within k"; the thresholded implementation bails out on a length gap
  * > k and confines the DP to the 2k+1 diagonal band — O(k·min) work.
  * On a dedup re-rank join (millions of candidate pairs, k ≤ 16) the
  * band is the difference between an edit-distance stage that scales
  * and one that quadratically melts on long documents.
  *
  * The rewrite is value-identical: for non-null inputs the predicate
  * `d <= k` holds iff the banded distance is not −1, and null inputs
  * propagate NULL through both forms. Strict `<` rewrites via
  * threshold k−1. Only literal non-negative Int bounds rewrite
  * (a negative bound's thresholded form would be a runtime error, and
  * the predicate is constant-false anyway); already-thresholded calls
  * are left alone.
  *
  * Injected by [[graft.GraftExtensions]]; tests attach via
  * `spark.experimental.extraOptimizations`. */
object RewriteBoundedLevenshtein extends Rule[LogicalPlan] {

  private def banded(a: Expression, b: Expression, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(k))),
      Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // levenshtein(a, b) <= k  /  k >= levenshtein(a, b)
      case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 1 => banded(a, b, k)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 1 => banded(a, b, k)
      // levenshtein(a, b) < k  /  k > levenshtein(a, b)  ≡  d <= k-1
      case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 2 => banded(a, b, k - 1)
      case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 2 => banded(a, b, k - 1)
    }
}
