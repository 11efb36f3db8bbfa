package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Add, ArrayAggregate, Cast, Expression, LambdaFunction, Literal, Multiply,
  NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.DotProduct

/** Optimizer rule: rewrite the canonical HOF dot product
  * `aggregate(zip_with(x, y, (a,b) -> a·b), 0.0, (s,v) -> s+v)` into the
  * codegen'd [[graft.functions.DotProduct]] expression. Higher-order
  * functions are CodegenFallback — each element pays an interpreted boxed
  * lambda call — while the native form fuses into whole-stage codegen;
  * users keep writing the declarative HOF and the plan gets the fast path.
  *
  * The match is deliberately NARROW, because the rewrite must be
  * bit-preserving, not just "equivalent":
  *  - the zero literal must be POSITIVE 0.0 (a −0.0 zero survives an
  *    empty-array fold and would change the output sign);
  *  - the multiply must be exactly the two lambda variables, each either
  *    double-typed or explicitly cast to double (a raw float·float
  *    multiply rounds to float BEFORE widening — different bits than the
  *    widen-first native loop — so it is left alone);
  *  - the merge must be a plain `acc + element` in either order (IEEE
  *    addition and multiplication are commutative bit-for-bit);
  *  - the finish lambda must be the identity.
  * Null algebra (unequal-length zip_with padding, null elements, empty
  * arrays) is reproduced exactly by DotProduct — spec-asserted. */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def stripDoubleCast(e: Expression): Expression = e match {
    case c: Cast if c.dataType == DoubleType => c.child
    case _                                   => e
  }

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case n: NamedLambdaVariable => n.exprId == v.exprId
      case _                      => false
    }

  private def isVarProduct(mul: Expression, x: NamedLambdaVariable,
                           y: NamedLambdaVariable): Boolean = mul match {
    case m: Multiply if m.dataType == DoubleType =>
      val (a, b) = (stripDoubleCast(m.left), stripDoubleCast(m.right))
      (sameVar(a, x) && sameVar(b, y)) || (sameVar(a, y) && sameVar(b, x))
    case _ => false
  }

  private def isPlainSum(add: Expression, acc: NamedLambdaVariable,
                         el: NamedLambdaVariable): Boolean = add match {
    case a: Add =>
      (sameVar(a.left, acc) && sameVar(a.right, el)) ||
        (sameVar(a.left, el) && sameVar(a.right, acc))
    case _ => false
  }

  private def isPositiveZero(e: Expression): Boolean = e match {
    case Literal(v: Double, DoubleType) =>
      java.lang.Double.doubleToRawLongBits(v) == 0L
    case _ => false
  }

  private def vecTyped(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _                                    => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(l, r, LambdaFunction(mul,
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            zero,
            LambdaFunction(add,
              Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
          if isPositiveZero(zero) && vecTyped(l) && vecTyped(r) &&
            isVarProduct(mul, x, y) && isPlainSum(add, acc, el) &&
            sameVar(fin, fv) =>
        DotProduct(l, r)
    }
}
