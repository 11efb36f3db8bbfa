package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Cast, Expression, LambdaFunction, NamedLambdaVariable, Subtract, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.ZipSubtract

/** Optimizer rule: rewrite the elementwise-difference HOF
  * `zip_with(a, b, (x, y) -> x − y)` into the codegen'd
  * [[graft.functions.ZipSubtract]] expression. This is the residual
  * computation of residual product quantization
  * (graft.operators.PqIndex.residualCodes and the IVF-RPQ search lanes):
  * `v − centroid` runs once per corpus row at encode time, and the HOF
  * form pays an interpreted boxed lambda per element — the same shape the
  * round-8 dot-product A/B measured at 8.7×.
  *
  * The match is deliberately NARROW (the [[DotProductRewrite]] discipline —
  * bit-preserving, not merely equivalent):
  *  - the lambda must be exactly `x − y` over the two lambda variables IN
  *    ORDER (subtraction does not commute), each either double-typed or
  *    explicitly cast to double;
  *  - the subtraction must be double-typed — a raw float − float rounds to
  *    float BEFORE widening (different bits than widen-first), so it is
  *    left alone;
  *  - both inputs must be float/double arrays.
  * Padding/null algebra (unequal lengths pad with null; null elements
  * null-propagate; output containsNull declared true like ZipWith's) is
  * reproduced exactly by ZipSubtract — spec-asserted. Double subtraction
  * has no ANSI behavior, so the rewrite is eval-mode-independent. */
object ZipWithSubtractRewrite extends Rule[LogicalPlan] {

  private def stripDoubleCast(e: Expression): Expression = e match {
    case c: Cast if c.dataType == DoubleType => c.child
    case _                                   => e
  }

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case n: NamedLambdaVariable => n.exprId == v.exprId
      case _                      => false
    }

  private def vecTyped(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _                                    => false
  }

  private def isOrderedDiff(sub: Expression, x: NamedLambdaVariable,
                            y: NamedLambdaVariable): Boolean = sub match {
    case s: Subtract if s.dataType == DoubleType =>
      sameVar(stripDoubleCast(s.left), x) && sameVar(stripDoubleCast(s.right), y)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ZipWith(l, r, LambdaFunction(sub,
            Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _))
          if vecTyped(l) && vecTyped(r) && isOrderedDiff(sub, x, y) =>
        ZipSubtract(l, r)
    }
}
