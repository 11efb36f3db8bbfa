package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data curation — the two shapes
  * a 100 TB pipeline actually needs:
  *
  *   - [[stratified]]: per-stratum rates (e.g. downsample English to 40%,
  *     keep low-resource languages whole) decided by a content-addressed
  *     hash bucket, NOT an RNG — stable across runs, engines, partitionings,
  *     and incremental re-ingestion (same property as [[Splits]]). A pure
  *     narrow map: zero shuffle, embarrassingly parallel.
  *   - [[quotaCap]]: at most N rows per group (domain caps, per-source
  *     quotas) by a deterministic rank. One hash shuffle on the group key;
  *     rank-within-group is the idiomatic window form and AQE splits skewed
  *     groups' sort spill, but the per-group sort is real — keep N small and
  *     groups many (the quota use-case) rather than using this as top-K over
  *     few giant groups (use TopKAggregator there).
  */
object Sampling {

  /** Keep a row iff its [[Splits.bucket]] (0..99) falls below the rate for
    * its stratum; strata absent from `rates` use `defaultPct`. */
  def stratified(df: DataFrame, keyCol: String, strataCol: String,
                 rates: Map[String, Int], defaultPct: Int = 100,
                 salt: String = "graft_sample_v1"): DataFrame = {
    val rate: Column = rates.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultPct)) { case (acc, (stratum, pct)) =>
        when(col(strataCol) === stratum, lit(pct)).otherwise(acc)
      }
    df.filter(Splits.bucket(col(keyCol), salt) < rate)
  }

  /** Keep the first `n` rows of each group under a deterministic total order
    * (`orderCols` must be unique within a group for stable output). */
  def quotaCap(df: DataFrame, groupCol: String, n: Int,
               orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(orderCols.map(col(_).asc): _*)
    df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= n)
  }
}
