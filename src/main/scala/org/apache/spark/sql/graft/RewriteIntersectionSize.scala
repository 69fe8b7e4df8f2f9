package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, Expression, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Optimizer rule: rewrite `size(array_intersect(a, b))` over string
  * arrays into the allocation-free [[IntersectionSize]] counter.
  *
  * The composition materializes the intersection ARRAY (hash-set walk +
  * GenericArrayData per row) only for `size` to read its length — the
  * per-candidate-pair inner loop of the exact set-similarity joins.
  * The rewrite is value-preserving everywhere it fires:
  * [[IntersectionSize]] reproduces array_intersect's distinct-count
  * semantics (duplicates once, a shared null element once) and
  * propagates NULL for a NULL array — which matches `size` only when
  * `size(NULL)` is NULL, so under `legacySizeOfNull` (-1 for NULL) the
  * rule additionally requires provably non-nullable inputs.
  */
object RewriteIntersectionSize extends Rule[LogicalPlan] {

  private def isStringArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(l, r), legacySizeOfNull)
          if isStringArray(l) && isStringArray(r) &&
            (!legacySizeOfNull || (!l.nullable && !r.nullable)) =>
        IntersectionSize(l, r)
    }
}
