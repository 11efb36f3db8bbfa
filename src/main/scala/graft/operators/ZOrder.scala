package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of several
  * normalized key columns into ONE clustering key, so range-partitioning +
  * sorting on that key co-locates rows that are close in EVERY dimension —
  * the multi-column generalization of sort-by-one-column data layout
  * (the technique behind Delta/Iceberg `ZORDER BY`).
  *
  * Why it matters at 100 TB: parquet row-group min/max pruning only skips
  * data when files are clustered on the filtered column. A single-column
  * sort gives perfect pruning on that column and none on the others; the
  * Z-curve gives every interleaved column bounded per-file ranges, so
  * selective filters on ANY of them prune scans. The interleave itself is a
  * narrow codegen'd expression over the scan; the only wide operation in
  * [[layout]] is the one range-partition shuffle every clustered write pays.
  *
  * Normalization is exact integer math — `(x - min) * (2^bits - 1) div
  * (max - min)` in BIGINT — not a rank/ntile pass: ranks would need a
  * global sort just to compute the key. Min/max come from a 1-row aggregate
  * that broadcasts. Skewed value distributions map to a skewed curve (rank
  * normalization would fix that at the price of the extra global pass, the
  * same trade Delta's implementation makes with range_partition_id).
  */
object ZOrder {

  /** Morton interleave of `dims` pre-normalized `bits`-bit BIGINT columns:
    * bit `j` of dimension `i` lands at position `j * n + i`. Pure bitwise
    * expression — codegen'd, no UDF. `n * bits` must fit a signed long. */
  def interleave(dims: Seq[Column], bits: Int = 16): Column = {
    val n = dims.size
    require(n >= 2 && n * bits <= 62, s"need 2+ dims and n*bits <= 62, got $n x $bits")
    val terms = for {
      (d, i) <- dims.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(d, j).bitwiseAND(lit(1L)), j * n + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** `cols` min-max normalized to `[0, 2^bits)` in exact BIGINT arithmetic
    * plus the interleaved `zkey`. Constant columns (max == min) normalize
    * to 0 rather than dividing by zero. The 1-row min/max aggregate joins
    * back as a broadcast — no second pass over the data. */
  def withZKey(df: DataFrame, cols: Seq[String], bits: Int = 16): DataFrame = {
    val aggCols = cols.flatMap(c =>
      Seq(min(col(c)).cast("long").as(s"__min_$c"),
          max(col(c)).cast("long").as(s"__max_$c")))
    val stats = df.agg(aggCols.head, aggCols.tail: _*)
    val joined = df.crossJoin(broadcast(stats))
    val norms = cols.map { c =>
      val range = col(s"__max_$c") - col(s"__min_$c")
      when(range === 0, lit(0L))
        .otherwise(expr(s"((CAST($c AS BIGINT) - __min_$c) * ${(1L << bits) - 1}) div (__max_$c - __min_$c)"))
    }
    joined
      .withColumn("zkey", interleave(norms, bits))
      .drop(cols.flatMap(c => Seq(s"__min_$c", s"__max_$c")): _*)
  }

  /** The layout itself: range-partition on `zkey` into `nBuckets` output
    * partitions and sort within each — the form a clustered parquet write
    * consumes (`.write` after this gives one file per bucket with tight
    * per-file min/max on every interleaved column). */
  def layout(df: DataFrame, cols: Seq[String], nBuckets: Int = 64,
             bits: Int = 16): DataFrame =
    withZKey(df, cols, bits)
      .repartitionByRange(nBuckets, col("zkey"))
      .sortWithinPartitions("zkey")

  /** Deterministic locality report: equi-width buckets over the zkey space
    * (`bucket = zkey * nBuckets div 2^(n*bits)` — no sampling, so the
    * oracle reproduces it exactly, unlike repartitionByRange's sampled
    * boundaries) with per-bucket row counts and per-column min/max. Tight
    * per-bucket ranges on EVERY column are the pruning win the layout
    * exists for; this is the measurable form of that claim. */
  def clusteringReport(df: DataFrame, cols: Seq[String], nBuckets: Int = 32,
                       bits: Int = 16): DataFrame = {
    val n = cols.size
    val keyed = withZKey(df, cols, bits)
      .withColumn("bucket", expr(s"(zkey * $nBuckets) div ${1L << (n * bits)}"))
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).cast("long").as(s"${c}_min"),
                            max(col(c)).cast("long").as(s"${c}_max")))
    keyed.groupBy("bucket")
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("bucket")
  }
}
