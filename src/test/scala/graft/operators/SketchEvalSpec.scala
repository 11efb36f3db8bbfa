package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** Accuracy/semantics units for the KMV sketch, retrieval-eval metrics, and
  * Neyman allocation (engine parity is the oracle's job; these pin that the
  * numbers MEAN what they claim). */
class SketchEvalSpec extends SparkSpec {

  test("kmv: estimates land near truth; jaccard bounded; sketch membership sane") {
    import spark.implicits._
    // two overlapping integer sets with known cardinalities: |A|=3000,
    // |B|=3000, |A∩B|=1000 (A: 0..2999, B: 2000..4999)
    val a = (0 until 3000).map(i => s"item_$i").toDF("item")
    val b = (2000 until 5000).map(i => s"item_$i").toDF("item")
    val r = Merge.kmvOverlap(a, b, k = 256).collect().head
    assert(r.getAs[Long]("n_a") === 3000L)
    assert(r.getAs[Long]("n_inter_exact") === 1000L)
    val dA = r.getAs[Double]("d_a_est")
    val inter = r.getAs[Double]("inter_est")
    val j = r.getAs[Double]("jaccard_est")
    assert(math.abs(dA - 3000) / 3000 < 0.25, s"d_a_est=$dA")
    assert(math.abs(inter - 1000) / 1000 < 0.35, s"inter_est=$inter")
    assert(j >= 0.0 && j <= 1.0)
    // true jaccard = 1000/5000 = 0.2
    assert(math.abs(j - 0.2) < 0.1, s"jaccard_est=$j")
  }

  test("retrievalEval: metrics are consistent and bounded on the fixture") {
    val rows = Similarity.retrievalEval(Tables.embeddings(spark, sf)).collect()
    assert(rows.length === 8)
    rows.foreach { r =>
      val p = r.getAs[Double]("precision_at_k")
      val rec = r.getAs[Double]("recall_at_k")
      val mrr = r.getAs[Double]("mrr")
      val nRel = r.getAs[Long]("n_rel_at_k")
      assert(p >= 0.0 && p <= 1.0 && rec >= 0.0 && rec <= 1.0)
      assert(mrr >= 0.0 && mrr <= 1.0)
      assert((nRel > 0) === (mrr > 0.0))
      assert(p === nRel / 10.0)
    }
  }

  test("neyman: the high-variance stratum is oversampled vs proportional allocation") {
    import spark.implicits._
    // two strata of equal size; stratum "wild" has 100x the spread
    val calm = (0 until 200).map(i => (i.toLong, "calm", 1000L + (i % 3)))
    val wild = (0 until 200).map(i => (1000L + i, "wild", (i % 100) * 100L))
    val df = (calm ++ wild).toDF("doc_id", "lang", "n_chars")
    val got = Sampling.neymanAllocation(df, "doc_id", "lang", "n_chars", 100L)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // proportional would give 50/50; Neyman must push nearly everything to
    // the wild stratum (sigma ratio ~ 100x multiplied into equal N)
    assert(got.getOrElse("wild", 0L) > 90L, got.toString)
    assert(got.getOrElse("calm", 0L) < 10L, got.toString)
  }
}
