package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hilbert-curve data layout — the locality-stronger alternative to
  * [[ZOrder]]: consecutive curve positions are always GRID NEIGHBORS
  * (Manhattan distance 1 — proven exhaustively in `HilbertSpec`), where the
  * Z-curve takes long diagonal jumps at power-of-two boundaries. Same
  * deployment shape as ZORDER BY: compute the curve key narrowly, then one
  * range-partition + sort-within-partitions write. Iceberg/Hudi expose
  * exactly this choice (z-order vs hilbert) for multi-dimensional layout.
  *
  * The index is the classic xy2d bit-walk: per bit level s (high to low),
  * add `s*s * ((3*rx) XOR ry)` and rotate/reflect the quadrant frame. The
  * rotation REFERENCES BOTH coordinates to produce each new coordinate, so
  * a naive nested-expression unroll doubles the tree per level (2^bits
  * blow-up); the implementation instead materializes each level as NAMED
  * projection columns — expression growth is linear in `bits`, and the
  * whole chain stays codegen'd narrow maps. 8 bits/dim (a 65k-cell grid)
  * is deliberate: layout bucketing needs orders of magnitude more cells
  * than output buckets, not value-exact ranks — and it keeps the unrolled
  * chain compact.
  *
  * Engine-portable by construction: pure integer +,-,*,AND,XOR on
  * nonnegative values (the rot(n) variant keeps coordinates in [0, 2^bits)
  * — no negative two's-complement corners), mirrored step-for-step by an
  * unrolled CTE chain in the DuckDB oracle. */
object Hilbert {

  val Bits = 8

  /** Driver-side reference implementation (tests compare the column
    * expression against this exhaustively). */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    var (x, y, d) = (x0, y0, 0L)
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      val (nx, ny) =
        if (ry == 0) {
          if (rx == 1) (n - 1 - y, n - 1 - x) else (y, x)
        } else (x, y)
      x = nx; y = ny
      s >>= 1
    }
    d
  }

  /** Append `hkey` = Hilbert index of two min-max-normalized columns.
    * Normalization is [[ZOrder]]'s exact-BIGINT form (1-row stats
    * broadcast); the bit-walk materializes per-level named columns
    * `__hx/__hy/__hd` so no expression tree ever duplicates. */
  def withHKey(df: DataFrame, cols: Seq[String], bits: Int = Bits): DataFrame = {
    require(cols.size == 2, "hilbert layout is 2-D (xy2d); use ZOrder for n-D")
    val n = 1L << bits
    val aggCols = cols.flatMap(c =>
      Seq(min(col(c)).cast("long").as(s"__min_$c"),
          max(col(c)).cast("long").as(s"__max_$c")))
    val stats = df.agg(aggCols.head, aggCols.tail: _*)
    def norm(c: String): Column = {
      val range = col(s"__max_$c") - col(s"__min_$c")
      when(range === 0, lit(0L))
        .otherwise(expr(s"((CAST($c AS BIGINT) - __min_$c) * ${n - 1}) div (__max_$c - __min_$c)"))
    }
    var out = df.crossJoin(broadcast(stats))
      .withColumn("__hx", norm(cols.head))
      .withColumn("__hy", norm(cols(1)))
      .withColumn("__hd", lit(0L))
    var s = n >> 1
    while (s > 0) {
      val x = col("__hx"); val y = col("__hy")
      val rx = when(x.bitwiseAND(lit(s)) > 0, 1L).otherwise(lit(0L))
      val ry = when(y.bitwiseAND(lit(s)) > 0, 1L).otherwise(lit(0L))
      // one projection per level: rx/ry/d first (reading this level's x,y),
      // then the rotated coordinates (reading the same x,y once each)
      out = out
        .withColumn("__hrx", rx)
        .withColumn("__hry", ry)
        .withColumn("__hd",
          col("__hd") + lit(s * s) *
            (lit(3L) * col("__hrx")).bitwiseXOR(col("__hry")))
        .withColumn("__hx2",
          when(col("__hry") === 0,
            when(col("__hrx") === 1, lit(n - 1) - y).otherwise(y)).otherwise(x))
        .withColumn("__hy2",
          when(col("__hry") === 0,
            when(col("__hrx") === 1, lit(n - 1) - x).otherwise(x)).otherwise(y))
        .withColumn("__hx", col("__hx2")).withColumn("__hy", col("__hy2"))
        .drop("__hx2", "__hy2", "__hrx", "__hry")
      s >>= 1
    }
    out.withColumn("hkey", col("__hd"))
      .drop("__hx", "__hy", "__hd")
      .drop(cols.flatMap(c => Seq(s"__min_$c", s"__max_$c")): _*)
  }

  /** Clustered-write form: range-partition + sort on the curve key. */
  def layout(df: DataFrame, cols: Seq[String], nBuckets: Int = 64,
             bits: Int = Bits): DataFrame =
    withHKey(df, cols, bits)
      .repartitionByRange(nBuckets, col("hkey"))
      .sortWithinPartitions("hkey")

  /** Deterministic locality report — [[ZOrder.clusteringReport]]'s shape
    * over the Hilbert key (equi-width curve-space buckets, per-bucket
    * count + per-column min/max), so the two curves' pruning quality is
    * directly comparable on the same columns. */
  def clusteringReport(df: DataFrame, cols: Seq[String], nBuckets: Int = 32,
                       bits: Int = Bits): DataFrame = {
    val keyed = withHKey(df, cols, bits)
      .withColumn("bucket", expr(s"(hkey * $nBuckets) div ${1L << (2 * bits)}"))
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).cast("long").as(s"${c}_min"),
                            max(col(c)).cast("long").as(s"${c}_max")))
    keyed.groupBy("bucket")
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("bucket")
  }
}
