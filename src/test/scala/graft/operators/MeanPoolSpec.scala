package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MeanPoolSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed element-wise mean") {
    val df = Seq(
      (1L, 10L, Seq(1.0f, 2.0f)), (1L, 11L, Seq(3.0f, 6.0f)),
      (2L, 20L, Seq(5.0f, 5.0f)))
      .toDF("doc", "m", "embedding")
    val r = VectorOps.meanPool(df, "doc", "m").collect()
      .map(x => x.getLong(0) -> x.getSeq[Double](2)).toMap
    assert(r(1L) == Seq(2.0, 4.0))
    assert(r(2L) == Seq(5.0, 5.0))
  }

  test("fold order is the member order, not arrival order") {
    // floats chosen so (a + b) + c != (c + b) + a in IEEE
    val vecs = Seq(1e8f, 1.5f, -1e8f)
    val fwd = vecs.zipWithIndex.map { case (v, i) =>
      (1L, i.toLong, Seq(v)) }
    val rev = fwd.reverse
    def pool(rows: Seq[(Long, Long, Seq[Float])]) =
      VectorOps.meanPool(rows.toDF("doc", "m", "embedding"), "doc", "m")
        .first().getSeq[Double](2).head
    assert(pool(fwd) == pool(rev), "same members must pool identically")
  }

  test("partition invariance") {
    val df = (1 to 600).map(i =>
      (i.toLong % 7, i.toLong, Seq.tabulate(8)(j => (i * j % 13).toFloat)))
      .toDF("doc", "m", "embedding")
    def run(p: Int) = VectorOps.meanPool(df.repartition(p), "doc", "m")
      .orderBy("doc").collect().map(_.toSeq).toSeq
    assert(run(1) == run(13))
  }
}
