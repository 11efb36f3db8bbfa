package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Add, Cast, ConcatWs, CreateNamedStruct, Expression, LambdaFunction, Literal,
  Md5, Multiply, NamedLambdaVariable, Slice}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, BinaryType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.BandKeys

/** Optimizer rule: rewrite the LSH band-key HOF
  * `transform(sequence(0, bands−1), b -> struct(b as band,
  *   md5(cast(concat_ws('|', slice(sig, b·r+1, r)) as binary)) as key))`
  * (`NearDup.bandFrame` — candidate generation for every MinHash lane) into
  * the one-pass [[graft.functions.BandKeys]]: per band, the HOF allocates a
  * slice array, joins it, casts, and digests through interpreted expression
  * evaluation; the native loop digests each signature element once with no
  * intermediate arrays.
  *
  * Bit-preservation (narrow-match discipline):
  *  - the struct field names must be exactly `band`/`key` (the native
  *    expression's schema — downstream `col("bk.band")` resolution depends
  *    on them) and the band value must be the lambda variable itself;
  *  - the slice start must be `b·r + 1` (either addition order; multiply
  *    operand order both ways) with the slice length literal equal to the
  *    same r — a stride different from the band width is not this shape;
  *  - the separator must be the literal `'|'` and the digest input the
  *    binary cast of the concat — concat_ws's null-element skip and
  *    short-array truncation are reproduced in the native eval;
  *  - the signature operand must be deterministic (evaluated once per band
  *    by the HOF, once per row by the native). */
object BandKeysRewrite extends Rule[LogicalPlan] {

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case n: NamedLambdaVariable => n.exprId == v.exprId
      case _                      => false
    }

  private def isLit(e: Expression, s: String): Boolean = e match {
    case Literal(u: UTF8String, StringType) => u != null && u.toString == s
    case _                                  => false
  }

  private def isOne(e: Expression): Boolean = e match {
    case Literal(1, IntegerType) => true
    case _                       => false
  }

  /** Some(r) when e is `b·r + 1` over the band lambda variable, r > 0.
    * The positivity guard matters: a degenerate `slice(sig, b·0+1, 0)`
    * evaluates fine as a HOF (empty slices), but `BandKeys` requires
    * rowsPerBand > 0 — matching it would turn a valid query into an
    * optimizer-time crash, so the rule refuses the shape instead. */
  private def strideOf(e: Expression, b: NamedLambdaVariable): Option[Int] = {
    def mul(m: Expression): Option[Int] = m match {
      case Multiply(bv, Literal(r: Int, IntegerType), _)
        if sameVar(bv, b) && r > 0 => Some(r)
      case Multiply(Literal(r: Int, IntegerType), bv, _)
        if sameVar(bv, b) && r > 0 => Some(r)
      case _ => None
    }
    e match {
      case Add(l, r, _) if isOne(r) => mul(l)
      case Add(l, r, _) if isOne(l) => mul(r)
      case _                        => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case org.apache.spark.sql.catalyst.expressions.ArrayTransform(bands,
            LambdaFunction(
              CreateNamedStruct(Seq(bandName, bv, keyName,
                Md5(cast @ Cast(ConcatWs(Seq(sep,
                  Slice(sig, startExpr, Literal(len: Int, IntegerType)))),
                  _, _, _)))),
              Seq(b: NamedLambdaVariable), _))
          if AscendingIntRange.stop(bands).isDefined &&
            isLit(bandName, "band") && isLit(keyName, "key") &&
            sameVar(bv, b) && isLit(sep, "|") &&
            cast.dataType == BinaryType && sig.deterministic &&
            (sig.dataType match {
              case ArrayType(StringType, _) => true
              case _                        => false
            }) &&
            strideOf(startExpr, b).contains(len) &&
            // keep start arithmetic inside Int range (the HOF's ANSI Add
            // would throw on overflow; the native wraps — unreachable shape)
            (AscendingIntRange.stop(bands).get.toLong + 1) * len <= Int.MaxValue =>
        BandKeys(sig, AscendingIntRange.stop(bands).get + 1, len)
    }
}
