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
}
