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

  test("kmvSketch: below-k input returns the exact distinct set; dedupes without a distinct pass") {
    import spark.implicits._
    // 40 distinct items, each duplicated 5x: the aggregator must dedupe
    val items = (0 until 200).map(i => s"item_${i % 40}").toDF("item")
    val r = Merge.kmvSketch(items, k = 64).collect().head
    assert(r.getAs[Long]("n_in_sketch") === 40L)
    assert(r.getAs[Double]("d_est") === 40.0) // exact below fill
    val kmv = r.getAs[scala.collection.Seq[Long]]("kmv")
    assert(kmv == kmv.sorted && kmv.distinct.size == kmv.size)
  }

  test("kmvSketch: estimate is partition-layout invariant and near truth at k<n") {
    import spark.implicits._
    val items = (0 until 5000).map(i => s"item_$i").toDF("item")
    val r1 = Merge.kmvSketch(items.repartition(1), k = 256).collect().head
    val r32 = Merge.kmvSketch(items.repartition(32), k = 256).collect().head
    assert(r1.getAs[scala.collection.Seq[Long]]("kmv") == r32.getAs[scala.collection.Seq[Long]]("kmv"))
    val est = r1.getAs[Double]("d_est")
    assert(est > 4000 && est < 6000, s"kmv estimate $est far from 5000")
  }

  test("bootstrapCI: CI brackets the point mean, deterministic across partitionings") {
    val docs = Tables.documents(spark, sf)
    val r = Validate.bootstrapCI(docs, "n_chars", "doc_id").collect().head
    val (mean, lo, hi) = (r.getAs[Double]("mean"),
      r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
    assert(lo < mean && mean < hi, s"CI [$lo, $hi] must bracket mean $mean")
    // width sanity: a 95% CI of a mean over n docs is narrow, not degenerate
    assert(hi - lo > 0.0 && hi - lo < mean, s"width ${hi - lo}")
    val r32 = Validate.bootstrapCI(docs.repartition(32), "n_chars", "doc_id")
      .collect().head
    assert(r32.getAs[Double]("ci_lo") == lo && r32.getAs[Double]("ci_hi") == hi)
  }

  test("lDiversity: planted single-sensitive-value class fails, mixed class passes") {
    import spark.implicits._
    val rows =
      (1 to 30).map(i => ("A", "x", "s1", i)) ++ // big class, ONE sensitive value
        (1 to 30).map(i => ("B", "y", s"s${i % 4}", i)) // big class, 4 values
    val df = rows.toDF("q1", "q2", "sv", "id")
    val byQi = Validate.lDiversity(df, "q1", "q2", "sv", k = 25L, l = 3L)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3),
        r.getDouble(5), r.getBoolean(6))).toMap
    val (an, al, ashare, aok) = byQi("A")
    assert(an == 30 && al == 1 && ashare == 1.0 && !aok)
    val (bn, bl, _, bok) = byQi("B")
    assert(bn == 30 && bl == 4 && bok)
  }

  test("quantileNormalize: per-group pct spans [0,1] and is partition invariant") {
    val docs = Tables.documents(spark, sf)
    val q = TextAnalysis.quantileNormalize(docs).collect()
    assert(q.forall { r =>
      val p = r.getAs[Double]("pct_in_group"); p >= 0.0 && p <= 1.0 })
    // calibration property: every group's bottom doc sits at pct 0.0 and
    // the distribution reaches into the top half (exact 1.0 only without
    // top-value ties, which the fixture may have)
    val spans = TextAnalysis.quantileNormalize(docs)
      .groupBy("source").agg(min("pct_in_group").as("lo"),
        max("pct_in_group").as("hi")).collect()
    assert(spans.forall { r =>
      r.getAs[Double]("lo") == 0.0 && r.getAs[Double]("hi") > 0.5 })
    val q32 = TextAnalysis.quantileNormalize(docs.repartition(32)).collect()
    assert(q.map(_.toSeq).toSeq == q32.map(_.toSeq).toSeq)
  }
}
