package graft.operators

import graft.SparkSpec
import graft.sources.Tables

class ClassifierSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf)

  test("map-literal form is bit-identical to the broadcast-join form") {
    val a = Classifier.score(docs).collect().toSeq
    val b = Classifier.scoreJoin(docs).collect().toSeq
    assert(a == b)
  }

  test("model weights are bounded and the relation is exactly nFeatures rows") {
    val m = Classifier.model(spark).collect()
    assert(m.length == Classifier.NFeatures)
    assert(m.forall(r => math.abs(r.getLong(1)) <= 1000L))
    // content-addressed weights must not be degenerate (all one sign/value)
    assert(m.map(_.getLong(1)).distinct.length > 100)
  }

  test("map-literal plan has no join and only the final sort's exchange") {
    val p = Classifier.score(docs).queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p.take(2000))
    assert("Exchange".r.findAllIn(p).size == 1, p.take(2000))
    assert(p.contains("rangepartitioning"), p.take(2000))
  }

  test("keep columns pass through in order; reserved-name collisions are refused loudly") {
    import org.apache.spark.sql.functions._
    val out = Classifier.scoreUnsorted(docs,
      keep = Seq(col("lang"), length(col("text")).as("n_chars")))
    assert(out.columns.toSeq ==
      Seq("doc_id", "n_feats", "score", "lang", "n_chars", "label"))
    assert(out.count() == docs.count())
    // a keep aliased to a reserved output name must throw, not silently
    // drop or shadow
    Seq(col("lang").as("doc_id"), col("lang").as("score"),
        col("lang").as("label"), col("lang").as("n_feats")).foreach { bad =>
      val e = intercept[IllegalArgumentException] {
        Classifier.scoreUnsorted(docs, keep = Seq(bad)).schema
      }
      assert(e.getMessage.contains("collide"), e.getMessage)
    }
  }

  test("join form broadcasts the model — never a sort-merge join") {
    val p = Classifier.scoreJoin(docs).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("calibrationReport: algebraic sigmoid bins and integer-evidence ECE") {
    import spark.implicits._
    // scale=20000: s=0 -> p=500000 (bin 5); s=+-20000 -> 750000/250000
    // (bins 7/2); s=10^9 -> 999990 (bin 9, saturation)
    val scored = Seq(
      (0L, true), (20000L, true), (-20000L, false), (1000000000L, true))
      .toDF("score", "truth")
    val got = Classifier.calibrationReport(scored, "score", "truth").collect()
    val byBin = got.map(r => r.getAs[Long]("bin") ->
      (r.getAs[Long]("n"), r.getAs[Long]("n_pos"),
        r.getAs[Long]("sum_p_micro"))).toMap
    assert(byBin === Map(
      2L -> ((1L, 0L, 250000L)),
      5L -> ((1L, 1L, 500000L)),
      7L -> ((1L, 1L, 750000L)),
      9L -> ((1L, 1L, 999990L))))
    // ece folds the same integers: sum|1e6*pos - sum_p| / (1e6 * N)
    val expectEce = (500000L + 250000L + 250000L + 10L).toDouble / 4000000.0
    assert(got.forall(_.getAs[Double]("ece") == expectEce))
    // confidence/accuracy are the per-bin one-division forms
    val b9 = got.find(_.getAs[Long]("bin") == 9L).get
    assert(b9.getAs[Double]("confidence") == 999990.0 / 1000000.0)
    assert(b9.getAs[Double]("accuracy") == 1.0)
  }

  test("calibrationReport: p is monotone in the score and clamped to [0, 1e6]") {
    import spark.implicits._
    val sweep = (-30 to 30).map(i => (i * 7919L, false)).toDF("score", "truth")
    // recover per-score p by running single-row bins at huge scale spread:
    // monotonicity of the squash is equivalent to bin monotonicity on a
    // strictly increasing score sweep binned fine enough; assert directly
    // on the closed form instead
    def p(s: Long): Long = {
      val mag = 500000L * math.abs(s) / (20000L + math.abs(s))
      500000L + (if (s >= 0) mag else -mag)
    }
    val ps = (-30 to 30).map(i => p(i * 7919L))
    assert(ps == ps.sorted)
    assert(ps.forall(v => v >= 0L && v <= 1000000L))
    // and the DataFrame path agrees with the closed form on the extremes
    val got = Classifier.calibrationReport(sweep, "score", "truth")
      .agg(org.apache.spark.sql.functions.sum("sum_p_micro"))
      .collect().head.getLong(0)
    assert(got == ps.sum)
  }
}
