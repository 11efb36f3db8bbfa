package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompressionSignalSpec extends SparkSpec {
  import spark.implicits._

  test("repetitive text compresses far below natural-ish prose; ratios bounded") {
    val docs = Seq(
      (1L, Seq.fill(200)("the same line over and over").mkString(" ")),
      (2L, (1 to 200).map(i => s"w${i * 7919 % 9973}x${i * 104729 % 31}")
        .mkString(" ")),
      (3L, "")).toDF("doc_id", "text")
    val r = TextAnalysis.compressionSignal(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    val rep = r(1L).getAs[Double]("comp_ratio")
    val varied = r(2L).getAs[Double]("comp_ratio")
    assert(rep < varied / 3, s"repetitive $rep vs varied $varied")
    assert(rep > 0.0 && varied < 1.2)
    assert(r(3L).getAs[Double]("comp_ratio") == 1.0) // empty-doc guard
    assert(r(2L).getAs[Long]("n_bytes") > 0 &&
      r(2L).getAs[Long]("comp_bytes") > 0)
  }

  test("deterministic across runs and partitionings") {
    val docs = (1 to 300).map(i =>
      (i.toLong, s"doc $i " * (i % 17 + 1))).toDF("doc_id", "text")
    def run(p: Int) = TextAnalysis.compressionSignal(docs.repartition(p))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(run(1) == run(13))
  }

  test("utf-8 accounting: multi-byte characters count as bytes, not chars") {
    val r = TextAnalysis.compressionSignal(
      Seq((1L, "é" * 10)).toDF("doc_id", "text")).first()
    assert(r.getAs[Long]("n_bytes") == 20L)
  }
}
