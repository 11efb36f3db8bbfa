package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  ArrayFilter, ArrayTransform, EqualTo, Expression, LambdaFunction, Literal,
  Murmur3Hash, NamedLambdaVariable, Pmod, Sequence, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}

import graft.functions.BucketCounts

/** Shared matcher for the folded ascending int range `0..stop`: the rules in
  * this lane run in the LAST optimizer batch, after ConstantFolding has
  * usually collapsed `sequence(lit(0), lit(stop))` into an integer-array
  * literal — both forms must match (the [[MinHashRewrite]] lesson). */
private[plans] object AscendingIntRange {
  def stop(e: Expression): Option[Int] = e match {
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
}

/** Optimizer rule: rewrite the per-bucket token-hash histogram HOF
  * `transform(sequence(0, n−1), k -> size(filter(sh, t -> pmod(hash(t), n) = k)))`
  * (the PPJoin+ suffix-filter sketch in `NearDup.prefixCandidates`) into the
  * one-pass [[graft.functions.BucketCounts]]. The HOF rescans the ENTIRE
  * shingle array once per bucket — n·|sh| interpreted lambda steps and
  * n·|sh| Murmur3 evaluations per row where one pass suffices.
  *
  * Bit-preservation (narrow-match discipline):
  *  - the hash must be a single-child `Murmur3Hash` of the filter's lambda
  *    variable itself — any cast or wrapper changes the hash bytes, refused;
  *    the seed is carried over verbatim;
  *  - the pmod modulus literal must EQUAL the sequence length (a histogram
  *    over a different modulus than the bucket range is not this shape);
  *  - `Size` must be non-legacy (`legacySizeOfNull = false`): the native
  *    expression reproduces `size(NULL) = NULL` per bucket for a NULL input
  *    array, not legacy −1;
  *  - the equality accepts both operand orders; both lambda variables are
  *    matched by exprId;
  *  - the array operand must be deterministic: the HOF evaluates it once
  *    per bucket, the native once per row — indistinguishable only for
  *    deterministic expressions (and evaluating an inline shingles chain
  *    once instead of n times is itself part of the win). */
object BucketCountsRewrite extends Rule[LogicalPlan] {

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case n: NamedLambdaVariable => n.exprId == v.exprId
      case _                      => false
    }

  /** Some(seed) when e is `pmod(hash(t), n)` with the given modulus. */
  private def bucketOf(e: Expression, t: NamedLambdaVariable,
                       n: Int): Option[Int] = e match {
    case Pmod(Murmur3Hash(Seq(tv), seed), Literal(m: Int, IntegerType), _)
        if m == n && sameVar(tv, t) => Some(seed)
    case _ => None
  }

  private def bucketEqSeed(cond: Expression, t: NamedLambdaVariable,
                           k: NamedLambdaVariable, n: Int): Option[Int] =
    cond match {
      case EqualTo(l, r) if sameVar(r, k) => bucketOf(l, t, n)
      case EqualTo(l, r) if sameVar(l, k) => bucketOf(r, t, n)
      case _                              => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayTransform(buckets,
            LambdaFunction(
              Size(ArrayFilter(sh,
                LambdaFunction(cond, Seq(t: NamedLambdaVariable), _)), false),
              Seq(k: NamedLambdaVariable), _))
          if AscendingIntRange.stop(buckets).isDefined && sh.deterministic &&
            (sh.dataType match {
              case ArrayType(StringType, _) => true
              case _                        => false
            }) &&
            bucketEqSeed(cond, t, k, AscendingIntRange.stop(buckets).get + 1)
              .isDefined =>
        val n = AscendingIntRange.stop(buckets).get + 1
        BucketCounts(sh, n, bucketEqSeed(cond, t, k, n).get)
    }
}
