package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, MinHashSignature, RollingHash32, SimHash32, SortedIntersectCount}

/** SparkSessionExtensions entry point: registers graft's native expressions
  * as SQL functions, so `spark.sql("SELECT cosine_similarity(a, b) ...")`
  * works alongside the Column API.
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

  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, b) => register(e, name, b) }
}

object GraftExtensions {
  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_similarity" -> (exprs => CosineSimilarity(exprs(0), exprs(1))),
    "sorted_intersect_count" -> (exprs => SortedIntersectCount(exprs(0), exprs(1))),
    "minhash_signature" -> (exprs =>
      MinHashSignature(exprs(0), exprs(1).eval().asInstanceOf[Int])),
    "simhash32" -> (exprs => SimHash32(exprs(0))),
    "rolling_hash32" -> (exprs => RollingHash32(exprs(0))),
  )

  /** Register on an already-running session (withExtensions only applies to
    * sessions built fresh). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, b, "built-in")
    }
}
