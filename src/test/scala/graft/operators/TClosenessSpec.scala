package graft.operators

import graft.SparkSpec

/** t-closeness semantics: zero distance for a class matching the global
  * distribution, hand-checked EMD on small domains, and the ORDERED-metric
  * property that distance grows with how far the mass sits from the global
  * shape along the domain order. */
class TClosenessSpec extends SparkSpec {

  private def rows(tuples: (String, String, String)*) = {
    import spark.implicits._
    tuples.toDF("q1", "q2", "sv")
  }

  test("class identical to the global distribution has t = 0") {
    val df = rows(
      ("1", "x", "a"), ("1", "x", "b"),
      ("2", "x", "a"), ("2", "x", "b"))
    val got = TClosenessFixture.byClass(
      Validate.tCloseness(df, "q1", "q2", "sv"))
    assert(got("1").getAs[Double]("t_closeness") == 0.0)
    assert(got("2").getAs[Double]("t_closeness") == 0.0)
    assert(got.values.forall(_.getAs[Boolean]("ok_t")))
  }

  test("two-value domain, one skewed class: t = |p1 - q1| by hand") {
    // class 1 all-'a' (p=(1,0)); global = (3/4, 1/4) over {a,b}
    // t = (1/(m-1)) * |1 - 3/4| = 1/4
    val df = rows(
      ("1", "x", "a"), ("1", "x", "a"),
      ("2", "x", "a"), ("2", "x", "b"))
    val got = TClosenessFixture.byClass(
      Validate.tCloseness(df, "q1", "q2", "sv"))
    assert(got("1").getAs[Double]("t_closeness") == 0.25)
    assert(got("2").getAs[Double]("t_closeness") == 0.25)
  }

  test("ordered metric: mass at the domain EDGE is farther than mass mid-domain") {
    // global uniform over {a,b,c}; class all-'a': cums (2/3, 1/3) -> t = 1/2
    // class all-'b': cums (-1/3, 1/3) -> t = 1/3  (closer, as EMD demands)
    val df = rows(
      ("1", "x", "a"), ("2", "x", "b"), ("3", "x", "c"))
    val got = TClosenessFixture.byClass(
      Validate.tCloseness(df, "q1", "q2", "sv"))
    assert(got("1").getAs[Double]("t_closeness") == 0.5)
    assert(got("2").getAs[Double]("t_closeness") == 1.0 / 3.0)
    assert(got("3").getAs[Double]("t_closeness") == 0.5)
  }

  test("single-value domain: t = 0 for every class (m = 1 guard, no div0)") {
    val df = rows(("1", "x", "a"), ("2", "x", "a"))
    val got = TClosenessFixture.byClass(
      Validate.tCloseness(df, "q1", "q2", "sv"))
    assert(got.values.forall(_.getAs[Double]("t_closeness") == 0.0))
  }

  test("fixture lane: t bounded in [0, 1] for every class") {
    val df = graft.sources.Tables.customer(spark, sf)
      .join(graft.sources.Tables.orders(spark, sf),
        org.apache.spark.sql.functions.col("c_custkey") ===
          org.apache.spark.sql.functions.col("o_custkey"))
    val rows = Validate.tCloseness(df, "c_nationkey", "c_mktsegment",
      "o_orderpriority").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[Double]("t_closeness")
      assert(t >= 0.0 && t <= 1.0, r.toString)
    }
  }
}

private object TClosenessFixture {
  def byClass(df: org.apache.spark.sql.DataFrame)
  : Map[String, org.apache.spark.sql.Row] =
    df.collect().map(r => r.getAs[String]("qi1") -> r).toMap
}
