package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column preprocessing for similarity/ANN pipelines: L2
  * normalization and int8 quantization — the standard storage/compute
  * reductions applied before indexing at scale (quantized vectors are 4x
  * smaller on the wire and in memory; normalized vectors turn cosine into a
  * plain dot product).
  *
  * Every op is a narrow map over the scan — zero shuffle. Arithmetic is
  * float->double widened and sequentially ordered (`aggregate`), matching
  * the determinism discipline of [[Similarity]] so the DuckDB oracle
  * reproduces results bit-identically.
  */
object VectorOps {

  /** Sequential-order L2 norm, float widened to double. */
  def l2Norm(v: Column): Column =
    sqrt(aggregate(v, lit(0.0), (a, x) => a + x.cast("double") * x.cast("double")))

  def maxAbs(v: Column): Column =
    array_max(transform(v, x => abs(x.cast("double"))))

  /** Unit-normalize to `array<double>` (null-safe only for non-zero norms —
    * callers filter zero vectors, which have no direction to keep). */
  def normalized(v: Column): Column = {
    val n = l2Norm(v)
    transform(v, x => x.cast("double") / n)
  }

  /** Symmetric int8 quantization with a PRE-COMPUTED max|x| column: scale =
    * 127 / max|x|, element = floor(x * scale). `floor` (not round) keeps the
    * result engine-portable — IEEE division and multiply are exactly
    * reproducible, banker's-vs-half-up rounding is not. Output range is
    * [-128, 127] (the negative max element floors to -128 when (127/m)*m
    * overshoots by an ulp — still valid int8). Zero vectors quantize to all
    * zeros. Stage `m` as a named column (see [[quantizeDigest]]) so it is
    * computed once per row. */
  def quantizedInt8(v: Column, m: Column): Column =
    transform(v,
      x => when(m === 0.0, lit(0L))
        .otherwise(floor(x.cast("double") * (lit(127.0) / m)).cast("long")))

  /** Convenience single-argument form. WARNING: an expression (not a named
    * column) referenced inside a `transform` lambda is re-evaluated per
    * element — this form pays O(dims) array_max per element, O(dims^2) per
    * row. Fine for ad-hoc use; hot paths must stage max|x| first and call
    * the two-argument overload. */
  def quantizedInt8(v: Column): Column = quantizedInt8(v, maxAbs(v))

  /** Oracle-facing digest: the array-valued ops reduced to scalar columns
    * (norm, max|x|, quantized sum/min/max) so the DuckDB hash gate compares
    * plain columns; the arrays themselves feed downstream operators.
    *
    * Staged through named columns deliberately: referencing `maxAbs` inside
    * the per-element lambda re-evaluates the O(dims) array_max PER ELEMENT
    * (O(dims^2)/row), and reusing the quantized-array expression in three
    * consumers recomputes it three times — Catalyst's CollapseProject keeps
    * a non-cheap alias staged instead of inlining it, so materializing each
    * as a column computes each exactly once per row (measured 3.1s -> sub-
    * second at sf0.1). */
  def quantizeDigest(df: DataFrame, id: String = "vec_id",
                     emb: String = "embedding"): DataFrame = {
    val staged = df
      .select(col(id), col(emb).as("__v"))
      .withColumn("max_abs", maxAbs(col("__v")))
      .withColumn("l2_norm", l2Norm(col("__v")))
      .withColumn("__q", quantizedInt8(col("__v"), col("max_abs")))
    staged.select(col(id),
      col("l2_norm"),
      col("max_abs"),
      aggregate(col("__q"), lit(0L), (a, x) => a + x).as("q_sum"),
      array_min(col("__q")).as("q_min"),
      array_max(col("__q")).as("q_max"))
  }
}
