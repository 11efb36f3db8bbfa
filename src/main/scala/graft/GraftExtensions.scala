package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, DotProduct, MinHashSignature, NfcNormalize, RollingHash32, SimHash32, SortedIntersectCount}
import graft.plans.{BandKeysRewrite, BucketCountsRewrite, CosineFoldRewrite, DotProductRewrite, LongDotRewrite, MinHashRewrite, SumSquaresRewrite, ZipWithSubtractRewrite}

/** SparkSessionExtensions entry point: registers graft's native expressions
  * as SQL functions, so `spark.sql("SELECT cosine_similarity(a, b) ...")`
  * works alongside the Column API, and injects the optimizer rules
  * (HOF dot-product → codegen'd [[graft.functions.DotProduct]]).
  *
  * Activate via
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  private def register(e: SparkSessionExtensions, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    e.injectFunction((FunctionIdentifier(name), info(name),
      (exprs: Seq[Expression]) => builder(exprs)))

  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, b) => register(e, name, b) }
    GraftExtensions.rewriteRules.foreach(r => e.injectOptimizerRule(_ => r))
  }
}

object GraftExtensions {

  /** The injected HOF-to-native rewrite lane, in dependency order:
    * DotProductRewrite must precede CosineFoldRewrite (the cosine fusion
    * matches on the DotProduct nodes the first rule produces — both run in
    * the same fixed-point batch, so convergence does not depend on the
    * order, but in-order lists fuse in a single pass). */
  private[graft] val rewriteRules: Seq[org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] = Seq(
    DotProductRewrite, CosineFoldRewrite, ZipWithSubtractRewrite,
    LongDotRewrite, MinHashRewrite, SumSquaresRewrite,
    BucketCountsRewrite, BandKeysRewrite)

  /** The numHashes argument must be a constant: it sizes the signature, so a
    * per-row value has no meaning. Fail analysis with a clear message instead
    * of an opaque NPE/ClassCastException from eval(). */
  private def foldableInt(name: String, e: Expression): Int = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, ShortType}
    val ok = e.foldable && (e.dataType match {
      case IntegerType | ShortType | ByteType => true
      case _                                  => false
    })
    if (!ok || e.eval() == null)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "_LEGACY_ERROR_TEMP_3102", // generic "<msg>" template
        messageParameters = Map("msg" ->
          s"$name requires a non-null foldable INT literal, got ${e.sql} (${e.dataType.simpleString})"))
    e.eval() match {
      case i: Int => i; case s: Short => s.toInt; case b: Byte => b.toInt
    }
  }

  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_similarity" -> (exprs => CosineSimilarity(exprs(0), exprs(1))),
    "sorted_intersect_count" -> (exprs => SortedIntersectCount(exprs(0), exprs(1))),
    "minhash_signature" -> (exprs =>
      MinHashSignature(exprs(0), foldableInt("minhash_signature(arr, numHashes)", exprs(1)))),
    "simhash32" -> (exprs => SimHash32(exprs(0))),
    "rolling_hash32" -> (exprs => RollingHash32(exprs(0))),
    "nfc_normalize" -> (exprs => NfcNormalize(exprs(0))),
    "dot_product" -> (exprs => DotProduct(exprs(0), exprs(1))),
  )

  /** Register on an already-running session (withExtensions only applies to
    * sessions built fresh): SQL functions plus the optimizer rules, the
    * latter via `experimental.extraOptimizations` (idempotent). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, b, "built-in")
    }
    val extra = spark.experimental.extraOptimizations
    val missing = rewriteRules.filterNot(extra.contains)
    if (missing.nonEmpty)
      spark.experimental.extraOptimizations = extra ++ missing
  }
}
