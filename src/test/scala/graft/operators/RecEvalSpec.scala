package graft.operators

import graft.SparkSpec

/** Recommender holdout-eval semantics: a hand graph where the held-out item
  * is recoverable, the exact-rational MRR arithmetic, the miss convention,
  * and eligibility (singleton baskets are excluded, not scored as misses). */
class RecEvalSpec extends SparkSpec {

  private def baskets(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("basket", "item")
  }

  test("hand graph: held-out items recovered through co-occurring train items") {
    // items 1,2 co-occur in every basket; item 9 = held-out max of baskets
    // 10/11 (also co-occurring). After holdout, {1,2} remain in 10/11 and
    // 9 survives in baskets 12/13 paired with 1,2 -> rec(1)/rec(2) contain 9.
    val df = baskets(
      (10L, 1L), (10L, 2L), (10L, 9L),
      (11L, 1L), (11L, 2L), (11L, 9L),
      (12L, 1L), (12L, 2L), (12L, 9L),
      (13L, 1L), (13L, 2L), (13L, 9L))
    // every basket holds out 9; train = {1,2} x 4 baskets -> co(1,2)=4 only;
    // 9 vanishes from train entirely -> no rec can contain it -> 0 hits
    val r = Graph.recommendationEval(df, "basket", "item").head()
    assert(r.getAs[Long]("n_users") == 4L)
    assert(r.getAs[Long]("n_hit") == 0L)
    assert(r.getAs[Double]("mrr") == 0.0)
  }

  test("held item survives in other baskets: hit at the hand-derived rank") {
    // baskets 10,11 hold out 9; baskets 20,21 hold out 30 (their max) and
    // keep 9 in train. Train: 10/11 -> {1,2}; 20/21 -> {1,9}.
    // Co-pairs: (1,2) co=2, (1,9) co=2; counts 1->4, 2->2, 9->2.
    // rec(1): 2 and 9 tie on cosine 2/sqrt(8) -> item order puts 9 at rank 2.
    val df = baskets(
      (10L, 1L), (10L, 2L), (10L, 9L),
      (11L, 1L), (11L, 2L), (11L, 9L),
      (20L, 1L), (20L, 9L), (20L, 30L),
      (21L, 1L), (21L, 9L), (21L, 30L))
    val r = Graph.recommendationEval(df, "basket", "item").head()
    // 10/11 recover 9 through rec(1) at rank 2; 20/21's held 30 was in no
    // OTHER basket, so it vanished from train entirely -> honest misses
    assert(r.getAs[Long]("n_users") == 4L)
    assert(r.getAs[Long]("n_hit") == 2L)
    assert(r.getAs[Double]("hit_rate") == 0.5)
    // both hits at rank 2: mrr = (3 + 3) / (6 * 4) exactly
    assert(r.getAs[Double]("mrr") == 0.25)
  }

  test("singleton baskets are ineligible, not scored as misses") {
    val df = baskets(
      (1L, 5L),            // singleton -> excluded
      (2L, 5L), (2L, 6L),
      (3L, 5L), (3L, 6L))
    val r = Graph.recommendationEval(df, "basket", "item").head()
    assert(r.getAs[Long]("n_users") == 2L)
  }

  test("fixture lane: rates in [0,1], mrr <= hit_rate") {
    import org.apache.spark.sql.functions._
    val b = graft.sources.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey")
      .join(graft.sources.Tables.lineitem(spark, sf)
        .select("l_orderkey", "l_suppkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
    val r = Graph.recommendationEval(b, "cust", "supp").head()
    val (hr, mrr) = (r.getAs[Double]("hit_rate"), r.getAs[Double]("mrr"))
    assert(hr >= 0.0 && hr <= 1.0)
    assert(mrr >= 0.0 && mrr <= hr) // each hit contributes at most 1
  }
}
