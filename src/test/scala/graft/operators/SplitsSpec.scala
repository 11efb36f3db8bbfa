package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SplitsSpec extends SparkSpec {
  import spark.implicits._

  test("clusterAssign: all members of a near-dup cluster land in one split") {
    val ids = (1L to 40L).toDF("doc_id")
    // two clusters: {1,2,3} (chained — closure must follow the chain) and
    // {10, 11}; everything else singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val out = Splits.clusterAssign(ids, pairs, "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("rep"), r.getAs[String]("split"))).toMap
    assert(out.size === 40)
    // whole cluster shares the representative AND the split
    assert(Set(out(1L), out(2L), out(3L)).size === 1)
    assert(out(1L)._1 === 1L)
    assert(Set(out(10L), out(11L)).size === 1)
    assert(out(10L)._1 === 10L)
    // singletons represent themselves and match the plain assign() bucket
    val plain = Splits.assign(ids, "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    (4L to 9L).foreach { id =>
      assert(out(id)._1 === id)
      assert(out(id)._2 === plain(id))
    }
  }

  test("clusterAssign is partitioning-invariant (content-addressed)") {
    val ids = (1L to 30L).toDF("doc_id")
    val pairs = Seq((5L, 6L), (6L, 7L)).toDF("a_id", "b_id")
    val a = Splits.clusterAssign(ids, pairs, "doc_id")
      .orderBy("doc_id").collect().toSeq
    val b = Splits.clusterAssign(ids.repartition(7), pairs.repartition(3), "doc_id")
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("lshAutoBits: floor, cap, monotone, and the fixture pick") {
    assert(Similarity.lshAutoBits(1) === 4)
    assert(Similarity.lshAutoBits(256) === 4) // 256/16 = 16 -> 4 bits exactly
    assert(Similarity.lshAutoBits(500) === 5) // the sf0.01 oracle pin
    assert(Similarity.lshAutoBits(5000) === 9) // sf0.1
    assert(Similarity.lshAutoBits(Long.MaxValue) === 24)
    val picks = Seq(10L, 100L, 1000L, 10000L, 100000L).map(Similarity.lshAutoBits(_))
    assert(picks === picks.sorted, "bits must grow with corpus size")
  }
}
