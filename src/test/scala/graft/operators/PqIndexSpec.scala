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
}
