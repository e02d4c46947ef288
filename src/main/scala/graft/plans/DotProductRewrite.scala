package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.ArrayDotProduct

/** Optimizer rule: rewrites the PORTABLE higher-order-function dot
  * product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
  *              0d, (acc, v) -> acc + v) }}}
  *
  * over two `array<float>` columns into the codegen'd
  * [[graft.functions.ArrayDotProduct]]. The two forms are bit-identical
  * by construction (same strict left fold, same NULL semantics for null
  * elements, null arrays and unequal lengths — see ArrayDotProduct's
  * scaladoc and the PropertySpec equivalence pin), so the rewrite is a
  * pure physical upgrade: the HOF runs interpreted per-element lambdas
  * outside whole-stage codegen (~10× slower on the all-pairs embedding
  * workloads); the native expression is a primitive loop inside it.
  *
  * Why a `Rule[LogicalPlan]` (SURVEY.md §7.3 tier c): a user writing
  * the engine-portable HOF spelling — the form this repo's own DuckDB
  * oracles mirror — gets the fast path without knowing `array_dot`
  * exists. The match is deliberately strict (exact lambda shape, float
  * element types, literal 0.0 seed); anything else is left untouched.
  * Activated via [[GraftExtensions]] (`spark.sql.extensions`) or
  * `spark.experimental.extraOptimizations`. */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def isZeroDouble(e: Expression): Boolean =
    e.foldable && e.dataType == DoubleType &&
      e.eval() == 0.0d

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(l, r, LambdaFunction(
              Multiply(Cast(x: NamedLambdaVariable, DoubleType, _, _),
                Cast(y: NamedLambdaVariable, DoubleType, _, _), _),
              Seq(xa: NamedLambdaVariable, ya: NamedLambdaVariable), _)),
            zero,
            LambdaFunction(
              Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _),
              Seq(acca: NamedLambdaVariable, va: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable,
              Seq(fina: NamedLambdaVariable), _))
          if isZeroDouble(zero) &&
            x.exprId == xa.exprId && y.exprId == ya.exprId &&
            acc.exprId == acca.exprId && v.exprId == va.exprId &&
            fin.exprId == fina.exprId &&
            isFloatArray(l) && isFloatArray(r) =>
        ArrayDotProduct(l, r)
    }
}
