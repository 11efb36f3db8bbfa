package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  ArrayMin, ArrayTransform, Cast, Concat, Expression,
  LambdaFunction, Literal, Md5, NamedLambdaVariable, Sequence}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{
  ArrayType, BinaryType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.MinHashSignature

/** Optimizer rule: rewrite the portable MinHash-signature HOF
  * `transform(sequence(0, k−1), s -> array_min(transform(sh,
  *   x -> md5(concat(cast(s as string), '_', x)))))`
  * (graft.operators.NearDup.minhashSigHof) into the one-call-per-row
  * [[graft.functions.MinHashSignature]] — k·|sh| interpreted lambda
  * evaluations (each building a concat + md5 expression result) become a
  * single JVM call that hashes each shingle once per seed against
  * precomputed seed prefixes.
  *
  * Bit-preservation notes:
  *  - the native min runs on RAW digest bytes where the HOF's array_min
  *    compares lowercase-hex STRINGS — hex encoding is byte-monotonic
  *    (0-9a-f ascend in ASCII and each byte maps to two chars), so the
  *    minima coincide;
  *  - null shingles are skipped by both (array_min ignores nulls); an
  *    all-null/empty shingle array yields an all-null signature;
  *  - a NULL shingle ARRAY yields `[null × k]` from the HOF (the outer
  *    transform still iterates the sequence) but NULL from the plain unary
  *    native expression — so for a nullable input the rewrite sets
  *    MinHashSignature's `nullAsAllNull` flag, which reproduces `[null × k]`
  *    INSIDE the expression and keeps the output non-nullable like the
  *    transform's. (Rounds 8–9 emitted an `if(isnull(sh), [null × k],
  *    minhash_signature(sh, k))` guard instead; that duplicated `sh`, and
  *    because this rule runs in the last optimizer batch — after
  *    CollapseProject — `sh` is usually the INLINE shingles transform
  *    chain, which a CodegenFallback consumer really evaluates twice, with
  *    no subexpression elimination to recover it and no `With` binding
  *    available this late. The flag removes the duplication entirely.);
  *  - int→string casts and md5 have no ANSI-mode divergence;
  *  - a sequence with a negative stop (descending: 0, −1, …) is refused —
  *    the native signature has no descending-seed form. */
object MinHashRewrite extends Rule[LogicalPlan] {

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case n: NamedLambdaVariable => n.exprId == v.exprId
      case _                      => false
    }

  private def isUnderscore(e: Expression): Boolean = e match {
    case Literal(u: UTF8String, StringType) => u != null && u.toString == "_"
    case _                                  => false
  }

  /** md5(cast(concat(cast(s as string), '_', x) as binary)) over the outer
    * seed var `s` and inner shingle var `x`. */
  private def isSeedHash(e: Expression, s: NamedLambdaVariable,
                         x: NamedLambdaVariable): Boolean = e match {
    case Md5(outer: Cast) if outer.dataType == BinaryType =>
      outer.child match {
        case Concat(Seq(sc: Cast, underscore, xv))
            if sc.dataType == StringType && sameVar(sc.child, s) &&
              isUnderscore(underscore) && sameVar(xv, x) => true
        case _ => false
      }
    case _ => false
  }

  /** Some(stop) when the expression is the ascending seed range 0..stop —
    * either the unfolded `sequence(0, stop)` call or (the form this rule
    * actually sees after ConstantFolding ran earlier in the batch) the
    * folded integer-array literal [0, 1, …, stop]. */
  private def seedRangeStop(e: Expression): Option[Int] = e match {
    case Sequence(Literal(0, IntegerType), Literal(stop: Int, IntegerType),
        None, _) if stop >= 0 => Some(stop)
    case Literal(arr: org.apache.spark.sql.catalyst.util.ArrayData,
        ArrayType(IntegerType, _)) if arr != null =>
      val n = arr.numElements()
      if (n > 0 &&
          (0 until n).forall(i => !arr.isNullAt(i) && arr.getInt(i) == i))
        Some(n - 1)
      else None
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayTransform(seeds,
            LambdaFunction(
              ArrayMin(ArrayTransform(sh,
                LambdaFunction(inner, Seq(x: NamedLambdaVariable), _))),
              Seq(s: NamedLambdaVariable), _))
          if seedRangeStop(seeds).isDefined &&
            sh.dataType.isInstanceOf[ArrayType] &&
            sh.dataType.asInstanceOf[ArrayType].elementType == StringType &&
            isSeedHash(inner, s, x) =>
        val k = seedRangeStop(seeds).get + 1
        MinHashSignature(sh, k, nullAsAllNull = sh.nullable)
    }
}
