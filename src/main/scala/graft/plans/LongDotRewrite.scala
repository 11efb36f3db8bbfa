package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Add, ArrayAggregate, EvalMode, Expression, LambdaFunction, Literal,
  Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

import graft.functions.LongDotProduct

/** Optimizer rule: rewrite the INTEGER dot-product HOF
  * `aggregate(zip_with(a, b, (x, y) -> x·y), 0L, (s, v) -> s+v)` over two
  * `array<bigint>` columns into the codegen'd
  * [[graft.functions.LongDotProduct]]. This is the int8-quantized scoring
  * loop of the SQ ANN lane (graft.operators.Similarity.sqTopK): an
  * interpreted lambda per element across the corpus × query crossJoin.
  *
  * Long arithmetic is exact, so the only bit-preservation concerns are the
  * overflow CONTRACT and null algebra:
  *  - the multiply and add must both be LEGACY or both ANSI (ANSI throws
  *    ARITHMETIC_OVERFLOW where LEGACY wraps — LongDotProduct reproduces
  *    whichever was matched); TRY mode (null-on-overflow) is refused;
  *  - the zero literal must be a long 0;
  *  - the multiply is the two lambda variables (either order — integer
  *    multiplication commutes even in overflow behavior), the merge a plain
  *    `acc + element` in either order, the finish the identity.
  * Null algebra (unequal-length zip_with padding, null elements) is
  * reproduced exactly — including the ANSI FAILURE path: zip_with evaluates
  * every overlap product before the fold, so an overflow past a null
  * element (or under a length mismatch) throws in the HOF, and
  * LongDotProduct scans the full overlap to throw identically instead of
  * short-circuiting to null (round-10 fix; spec-asserted both ways). */
object LongDotRewrite extends Rule[LogicalPlan] {

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case n: NamedLambdaVariable => n.exprId == v.exprId
      case _                      => false
    }

  private def longArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _                      => false
  }

  /** Some((failOnError)) when the node is a long multiply of exactly the two
    * vars under LEGACY or ANSI; None otherwise. */
  private def varProductMode(mul: Expression, x: NamedLambdaVariable,
                             y: NamedLambdaVariable): Option[Boolean] = mul match {
    case m: Multiply if m.dataType == LongType &&
        ((sameVar(m.left, x) && sameVar(m.right, y)) ||
         (sameVar(m.left, y) && sameVar(m.right, x))) =>
      m.evalContext.evalMode match {
        case EvalMode.LEGACY => Some(false)
        case EvalMode.ANSI   => Some(true)
        case _               => None // TRY: null-on-overflow, not reproduced
      }
    case _ => None
  }

  private def plainSumMode(add: Expression, acc: NamedLambdaVariable,
                           el: NamedLambdaVariable): Option[Boolean] = add match {
    case a: Add if a.dataType == LongType &&
        ((sameVar(a.left, acc) && sameVar(a.right, el)) ||
         (sameVar(a.left, el) && sameVar(a.right, acc))) =>
      a.evalContext.evalMode match {
        case EvalMode.LEGACY => Some(false)
        case EvalMode.ANSI   => Some(true)
        case _               => None
      }
    case _ => None
  }

  private def isLongZero(e: Expression): Boolean = e match {
    case Literal(v: Long, LongType) => v == 0L
    case _                          => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg @ ArrayAggregate(
            ZipWith(l, r, LambdaFunction(mul,
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            zero,
            LambdaFunction(add,
              Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
          if isLongZero(zero) && longArr(l) && longArr(r) &&
            sameVar(fin, fv) &&
            varProductMode(mul, x, y).isDefined &&
            varProductMode(mul, x, y) == plainSumMode(add, acc, el) =>
        LongDotProduct(l, r, varProductMode(mul, x, y).get)
    }
}
