package graft.operators

import graft.SparkSpec
import graft.sources.Tables

class PqIndexSpec extends SparkSpec {

  test("pq codes are partition-invariant, nibble-ranged, and pack losslessly") {
    val emb = Tables.embeddings(spark, sf)
    val base = PqIndex.codes(emb).collect()
    // decimal-exact training + argmin must be independent of partitioning
    val reparted = PqIndex.codes(emb.repartition(7)).collect()
    assert(base.toSeq == reparted.toSeq)
    assert(base.nonEmpty)
    base.foreach { r =>
      val packed = r.getAs[Long]("pq_code")
      (0 until PqIndex.M).foreach { s =>
        val c = r.getAs[Long](s"code_$s")
        assert(c >= 0 && c < PqIndex.K, s"code_$s=$c out of nibble range")
        assert(((packed >> (4 * s)) & 0xf) == c, "nibble packing mismatch")
      }
    }
  }

  test("pq uses the code space: multiple distinct codes appear per subspace") {
    val emb = Tables.embeddings(spark, sf)
    val rows = PqIndex.codes(emb).collect()
    (0 until PqIndex.M).foreach { s =>
      val distinct = rows.map(_.getAs[Long](s"code_$s")).distinct.length
      assert(distinct > 1, s"subspace $s collapsed to one code")
    }
  }

  test("residualCodes: list agrees with IVF assignment; residuals shrink; packing holds") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
    val rc = PqIndex.residualCodes(emb).collect()
    assert(rc.nonEmpty)
    // coarse list in the output is exactly the IVF assignment
    val assign = IvfIndex.assignments(emb, 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rc.foreach { r =>
      assert(r.getAs[Long]("list") == assign(r.getAs[Long]("vec_id")))
      val packed = r.getAs[Long]("pq_code")
      (0 until PqIndex.M).foreach { s =>
        val c = r.getAs[Long](s"code_$s")
        assert(c >= 0 && c < PqIndex.K)
        assert(((packed >> (4 * s)) & 0xf) == c)
      }
    }
    // the premise of residual encoding: subtracting each cell's MEAN can
    // only shrink the second moment (sum ||v - mean||^2 = sum ||v||^2 -
    // n * ||mean||^2), so residual msn < raw msn is structural. The MARGIN
    // is geometry-dependent: this fixture's embeddings are L2-normalized
    // and nearly uniform on the 64-d sphere, so coarse cells capture
    // little (~6% here); clustered real corpora capture far more.
    def msn(df: org.apache.spark.sql.DataFrame): Double = df
      .select(aggregate(transform(col("embedding"), x => x.cast("double") * x),
        lit(0.0), (acc, t) => acc + t).as("n2"))
      .agg(avg("n2")).head().getDouble(0)
    val raw = msn(emb)
    // rebuild the residual frame the same way the operator does
    val resid = {
      val e = graft.core.Parallelism.forCompute(emb)
      val (matrix, listIds) = IvfIndex.trainCoarse(e, 8, 1)
      val ds = graft.functions.VectorFunctions.squared_distances(col("embedding"), matrix)
      val pos = array_position(ds, array_min(ds)).cast("int")
      e.select(zip_with(col("embedding").cast("array<double>"),
        element_at(matrix, pos), (x, c) => x - c).as("embedding"))
    }
    val res = msn(resid)
    assert(res < raw, s"residual msn $res not below raw $raw")
  }

  test("ivfpq probing every list reproduces full ADC top-k exactly") {
    // the IVF exactness discipline, composed: nProbe = nLists means no
    // pruning, so the composed index must return adcTopK's rows verbatim
    val emb = Tables.embeddings(spark, sf)
    val full = PqIndex.adcTopK(emb, nQueries = 4, k = 5).collect().toSeq
    val composed = PqIndex.ivfpqTopK(emb, nQueries = 4, k = 5,
      nLists = 8, nProbe = 8).collect().toSeq
    assert(composed == full)
  }

  test("ivfpq pruned probing returns k in-corpus neighbors per query") {
    val emb = Tables.embeddings(spark, sf)
    val rows = PqIndex.ivfpqTopK(emb, nQueries = 4, k = 5,
      nLists = 8, nProbe = 2).collect()
    assert(rows.length == 4 * 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("q_id") != r.getAs[Long]("n_id"))
      assert(r.getAs[Long]("rk") >= 1 && r.getAs[Long]("rk") <= 5)
    }
  }

  test("ivfrpq is deterministic under repartitioning and structurally sound") {
    val emb = Tables.embeddings(spark, sf)
    val a = PqIndex.ivfrpqTopK(emb, nQueries = 4, k = 5).collect().toSeq
    val b = PqIndex.ivfrpqTopK(emb.repartition(7), nQueries = 4, k = 5)
      .collect().toSeq
    assert(a == b)
    assert(a.length == 4 * 5)
    a.foreach { r =>
      assert(r.getAs[Long]("q_id") != r.getAs[Long]("n_id"))
      assert(r.getAs[Long]("rk") >= 1 && r.getAs[Long]("rk") <= 5)
    }
  }

  test("assignNewBatch freezes the quantizer: history balance is unchanged by ingest") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
    val history = emb.filter(col("vec_id") < 400)
    val batch = emb.filter(col("vec_id") >= 400)
    val report = IvfIndex.assignNewBatch(history, batch).collect()
    // totals conserve: every history and batch vector lands in exactly one list
    assert(report.map(_.getAs[Long]("n_history")).sum == history.count())
    assert(report.map(_.getAs[Long]("n_new")).sum == batch.count())
    // frozen centroids: history-side counts equal training on history alone
    val solo = IvfIndex.assignments(history, 8, 1)
      .groupBy("list").count().collect()
      .map(r => r.getAs[Long]("list") -> r.getAs[Long]("count")).toMap
    report.foreach { r =>
      assert(solo.getOrElse(r.getAs[Long]("list"), 0L) == r.getAs[Long]("n_history"))
    }
  }

  test("ivfrpq pruning can only push rank-r distance up, never down") {
    // probing fewer lists removes candidates, so the rank-r survivor under
    // nProbe=2 must sit at >= the rank-r distance when every list is probed
    val emb = Tables.embeddings(spark, sf)
    def byRank(nProbe: Int): Map[(Long, Long), BigDecimal] =
      PqIndex.ivfrpqTopK(emb, nQueries = 4, k = 5, nLists = 8, nProbe = nProbe)
        .collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rk")) ->
          BigDecimal(r.getAs[String]("adist")))
        .toMap
    val pruned = byRank(2)
    val all = byRank(8)
    pruned.foreach { case (key, d) => assert(d >= all(key), s"$key: $d < ${all(key)}") }
  }
}
