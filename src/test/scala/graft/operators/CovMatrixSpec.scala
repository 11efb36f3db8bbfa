package graft.operators

import graft.SparkSpec

/** Covariance-matrix semantics: exact values on grid-representable
  * vectors, the floor-grid contract on arbitrary floats, pair coverage,
  * and the no-join plan shape. */
class CovMatrixSpec extends SparkSpec {

  private def vecs(rows: Seq[Float]*) = {
    import spark.implicits._
    rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
  }

  test("2x2 integer vectors: all pairwise covariances exactly 1") {
    // rows (1,2) and (3,4): cov of [1,3] with anything here is 1.0,
    // exactly representable at the 2^-20 grid
    val got = CovMatrixFixture.collectMap(
      VectorOps.covarianceMatrix(vecs(Seq(1f, 2f), Seq(3f, 4f)), "embedding"))
    assert(got.keySet == Set((0L, 0L), (0L, 1L), (1L, 1L)))
    got.values.foreach { r =>
      assert(r.getAs[Long]("n") == 2L)
      assert(r.getAs[Double]("cov_pop") == 1.0)
    }
    // exact quantized sums (surfaced as doubles — exact below 2^53):
    // 4 * 2^20 and 6 * 2^20
    val d01 = got((0L, 1L))
    assert(d01.getAs[Double]("sum_qx") == (4L << 20).toDouble)
    assert(d01.getAs[Double]("sum_qy") == (6L << 20).toDouble)
  }

  test("grid contract: moments equal a direct floor(x * 2^20) replay") {
    val rows = Seq(Seq(0.1f, -0.37f, 0.925f), Seq(-0.004f, 0.61f, -1.2f),
      Seq(0.333f, 0.0f, 0.5f))
    val got = CovMatrixFixture.collectMap(
      VectorOps.covarianceMatrix(vecs(rows: _*), "embedding"))
    def q(x: Float): Long = math.floor(x.toDouble * 1048576.0).toLong
    for (i <- 0 until 3; j <- i until 3) {
      val sxy = rows.map(r => q(r(i)) * q(r(j))).sum
      assert(got((i.toLong, j.toLong)).getAs[Double]("sum_qxy")
        == sxy.toDouble, s"pair ($i,$j)")
    }
    // diagonal variance is nonnegative
    for (i <- 0 until 3)
      assert(got((i.toLong, i.toLong)).getAs[Double]("cov_pop") >= 0.0)
  }

  test("d dims emit exactly d*(d+1)/2 pairs, fixture sanity") {
    val df = VectorOps.covarianceMatrix(
      graft.sources.Tables.embeddings(spark, sf), "embedding")
    val rows = df.collect()
    assert(rows.length == 64 * 65 / 2)
    // symmetric-positive-semidefinite necessary condition:
    // |cov(i,j)| <= sqrt(var_i * var_j)
    val diag = rows.filter(r => r.getAs[Long]("i") == r.getAs[Long]("j"))
      .map(r => r.getAs[Long]("i") -> r.getAs[Double]("cov_pop")).toMap
    rows.foreach { r =>
      val (i, j) = (r.getAs[Long]("i"), r.getAs[Long]("j"))
      val bound = math.sqrt(diag(i) * diag(j)) + 1e-12
      assert(math.abs(r.getAs[Double]("cov_pop")) <= bound, s"($i,$j)")
    }
  }

  // SCOPE OF THE PARITY CLAIM (deliberate, do not tighten): the aggregate's
  // i128 sums stay EXACT past the twin's decimal(30,0) domain, where Spark's
  // non-ANSI decimal sum would overflow to NULL — so "bit-identical" holds
  // only for in-domain inputs (|sum of quantized products| < 10^30, i.e.
  // every realistic embedding corpus; ~2^99 quantized-unit mass). Out of
  // domain the aggregate diverges in the EXACT direction by design
  // (CovMomentAggregator.scala scaladoc). This spec exercises in-domain
  // inputs only, intentionally.
  test("moment-grid aggregate bit-identical to the exploded decimal twin " +
    "(fixture + ragged + null-bearing, multi-partition merge path)") {
    def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().toSeq.map { r =>
        def bits(n: Int) =
          if (r.isNullAt(n)) "null"
          else java.lang.Double.doubleToRawLongBits(r.getDouble(n)).toString
        s"${r.getLong(0)},${r.getLong(1)},${r.getLong(2)}," +
          s"${bits(3)},${bits(4)},${bits(5)},${bits(6)}"
      }
    val emb = graft.sources.Tables.embeddings(spark, sf)
    assert(rowsOf(VectorOps.covarianceMatrix(emb, "embedding")) ==
      rowsOf(VectorOps.covarianceMatrixExploded(emb, "embedding")))
    // ragged lengths, null elements, a null vector, negatives and values
    // past the float-unit range — repartitioned so merge() runs
    import spark.implicits._
    val ugly = Seq(
      (1L, Seq[java.lang.Float](1.5f, -2.25f, 3.125f, 0.001f)),
      (2L, Seq[java.lang.Float](-0.5f, null, 2.0f)),
      (3L, Seq[java.lang.Float](4.75f)),
      (4L, null.asInstanceOf[Seq[java.lang.Float]]),
      (5L, Seq[java.lang.Float](null, null, -3000.5f, 7.125f)),
      (6L, Seq[java.lang.Float](0.0f, 123.456f, -0.0f, 9.5f)))
      .toDF("vec_id", "embedding").repartition(4)
    assert(rowsOf(VectorOps.covarianceMatrix(ugly, "embedding")) ==
      rowsOf(VectorOps.covarianceMatrixExploded(ugly, "embedding")))
  }

  test("out-of-domain divergence pins the EXACT direction: past the twin's " +
    "decimal range the aggregate stays exact while the twin NULLs") {
    // Two rows of [1e13]: floor(1e13 * 2^20) saturates to Long.MaxValue in
    // BOTH paths (the JVM .toLong and the twin's non-ANSI double→long
    // cast). Per-row product = Long.MaxValue² ≈ 8.5e37 still fits the
    // twin's decimal(38,0); the 2-row SUM ≈ 1.7e38 needs 39 digits →
    // non-ANSI decimal sum overflows to NULL. The aggregate's i128 holds
    // it exactly (2·(2^63−1)² = 2^127 − 2^65 + 2 < 2^127 − 1) and
    // surfaces the correctly-rounded double — the one DELIBERATE
    // divergence the parity scaladoc claims, asserted here so the claim
    // has a guarded boundary.
    import spark.implicits._
    val huge = Seq((1L, Seq(1e13f)), (2L, Seq(1e13f)))
      .toDF("vec_id", "embedding")
    val native = CovMatrixFixture.collectMap(
      VectorOps.covarianceMatrix(huge, "embedding"))((0L, 0L))
    val qMax = BigInt(Long.MaxValue)
    assert(native.getAs[Long]("n") == 2L)
    assert(native.getAs[Double]("sum_qx") == (qMax * 2).doubleValue)
    assert(native.getAs[Double]("sum_qxy") == (qMax.pow(2) * 2).doubleValue)
    // the twin's documented behavior is non-ANSI (saturating casts,
    // overflow→NULL); pin the session mode explicitly around its run
    val ansiBefore = spark.conf.get("spark.sql.ansi.enabled", "true")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      val twin = CovMatrixFixture.collectMap(
        VectorOps.covarianceMatrixExploded(huge, "embedding"))((0L, 0L))
      assert(twin.getAs[Long]("n") == 2L)
      // the linear sums are still in-domain for decimal(29,0): identical
      assert(twin.getAs[Double]("sum_qx") == native.getAs[Double]("sum_qx"))
      // the product sum overflowed: NULL in the twin, exact in the native
      assert(twin.isNullAt(twin.fieldIndex("sum_qxy")))
    } finally spark.conf.set("spark.sql.ansi.enabled", ansiBefore)
  }

  test("plan: no join — the pair expansion is a narrow generate") {
    val df = VectorOps.covarianceMatrix(
      graft.sources.Tables.embeddings(spark, sf), "embedding")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p.take(1500))
    assert(p.contains("Generate"), p.take(1500))
  }
}

private object CovMatrixFixture {
  def collectMap(df: org.apache.spark.sql.DataFrame)
  : Map[(Long, Long), org.apache.spark.sql.Row] =
    df.collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j")) -> r).toMap
}
