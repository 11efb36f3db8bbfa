package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Add, ArrayAggregate, Cast, Expression, LambdaFunction, Literal, Multiply,
  NamedLambdaVariable}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.SumSquares

/** Optimizer rule: rewrite the sum-of-squares fold
  * `aggregate(v, 0.0, (a, x) -> a + x·x)` into the codegen'd
  * [[graft.functions.SumSquares]] — the ‖v‖² kernel under
  * `VectorOps.l2Norm` (quantization digests, unit normalization) and the
  * PCA Parseval audit lane. Differs from [[DotProductRewrite]]'s shape in
  * that there is no zip_with: the merge lambda itself squares the element.
  *
  * Bit-preservation (the usual narrow-match discipline):
  *  - the zero must be POSITIVE 0.0 (empty-array folds return it);
  *  - the squared operand must be the element variable on BOTH multiply
  *    sides, each double-typed or explicitly cast to double (a raw
  *    float·float square rounds to float before widening — refused);
  *  - the merge must be `acc + (x·x)` in either addition order;
  *  - the finish lambda must be the identity.
  * A null element poisons to null exactly like the HOF (`a + null`);
  * emitted as a UNARY expression so a non-attribute child is evaluated
  * once, never twice as `DotProduct(v, v)` would. */
object SumSquaresRewrite extends Rule[LogicalPlan] {

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

  private def isSelfSquare(mul: Expression, x: NamedLambdaVariable): Boolean =
    mul match {
      case m: Multiply if m.dataType == DoubleType =>
        sameVar(stripDoubleCast(m.left), x) && sameVar(stripDoubleCast(m.right), x)
      case _ => false
    }

  private def isAccPlusSquare(add: Expression, acc: NamedLambdaVariable,
                              x: NamedLambdaVariable): Boolean = add match {
    case a: Add =>
      (sameVar(a.left, acc) && isSelfSquare(a.right, x)) ||
        (sameVar(a.right, acc) && isSelfSquare(a.left, x))
    case _ => false
  }

  private def isPositiveZero(e: Expression): Boolean = e match {
    case Literal(v: Double, DoubleType) =>
      java.lang.Double.doubleToRawLongBits(v) == 0L
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(v, zero,
            LambdaFunction(add,
              Seq(acc: NamedLambdaVariable, x: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
          if isPositiveZero(zero) && vecTyped(v) &&
            isAccPlusSquare(add, acc, x) && sameVar(fin, fv) =>
        SumSquares(v)
    }
}
