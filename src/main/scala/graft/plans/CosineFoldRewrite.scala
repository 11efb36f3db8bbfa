package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Divide, EvalMode, Expression, Multiply, Sqrt}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{CosineFold, DotProduct}

/** Optimizer rule: fuse the cosine COMPOSITION
  * `dot_product(a, b) / (sqrt(dot_product(a, a)) · sqrt(dot_product(b, b)))`
  * into the single-pass codegen'd [[graft.functions.CosineFold]]. Runs in
  * the same fixed-point batch as [[DotProductRewrite]], so a user writing
  * the portable HOF cosine (graft.operators.Similarity.cosineHof) first
  * gets its three folds rewritten to DotProduct, then the whole composition
  * fused — three array passes become one, still inside whole-stage codegen.
  *
  * Bit-preservation: each of the three accumulators keeps its own
  * sequential ascending fold (fusing reorders nothing within any
  * accumulator), and CosineFold reproduces Spark Divide's zero-divisor
  * contract — NULL under LEGACY/TRY, DIVIDE_BY_ZERO under ANSI (the thrown
  * error loses only the SQL-fragment query context; class and condition
  * are identical — the one documented divergence, confined to the failure
  * path). The match requires the dividend's operand pair (a, b) to
  * semantically equal the two norm operands — `dot(a,a)` and `dot(b,b)` in
  * either multiplication order (IEEE multiplication commutes
  * bit-for-bit). */
object CosineFoldRewrite extends Rule[LogicalPlan] {

  private def normOperand(e: Expression): Option[Expression] = e match {
    case Sqrt(DotProduct(u, v)) if u.semanticEquals(v) => Some(u)
    case _                                             => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case d @ Divide(DotProduct(a, b), Multiply(sl, sr, _), _) =>
        (normOperand(sl), normOperand(sr)) match {
          case (Some(u), Some(v))
              if (a.semanticEquals(u) && b.semanticEquals(v)) ||
                 (a.semanticEquals(v) && b.semanticEquals(u)) =>
            CosineFold(a, b, d.evalContext.evalMode == EvalMode.ANSI)
          case _ => d
        }
    }
}
