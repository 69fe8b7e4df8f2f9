package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the portable higher-order dot-product
  * composition
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v) }}}
  * into the native codegen [[DotProduct]] expression.
  *
  * The HOF chain evaluates its lambdas interpreted, per element, per
  * row — the hot inner loop of cosine scoring. [[DotProduct]] is
  * value-identical on EVERY input (same left-to-right fold, one
  * multiply + one add per element; zip_with's null padding on length
  * mismatch poisons the fold to NULL exactly as DotProduct returns
  * NULL), so the rewrite is a pure plan improvement: users writing the
  * portable SQL form get the primitive loop without knowing the native
  * function exists.
  *
  * Injected by [[graft.GraftExtensions]] (injectOptimizerRule); tests
  * attach it to an existing session via
  * `spark.experimental.extraOptimizations`.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  /** x*y (or y*x — IEEE multiplication commutes bit-exactly). */
  private def isElementProduct(f: Expression,
      x: NamedLambdaVariable, y: NamedLambdaVariable): Boolean = f match {
    case Multiply(l, r, _) =>
      (sameVar(l, x) && sameVar(r, y)) || (sameVar(l, y) && sameVar(r, x))
    case _ => false
  }

  private def isSum(f: Expression,
      acc: NamedLambdaVariable, v: NamedLambdaVariable): Boolean = f match {
    case Add(l, r, _) =>
      (sameVar(l, acc) && sameVar(r, v)) || (sameVar(l, v) && sameVar(r, acc))
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(product, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(merge, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          LambdaFunction(finish, Seq(facc: NamedLambdaVariable), _))
        if isDoubleArray(a) && isDoubleArray(b) &&
          isElementProduct(product, x, y) && isSum(merge, acc, v) &&
          sameVar(finish, facc) =>
        DotProduct(a, b)
    }
}
