package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Welch t-test semantics: hand-checked statistic, exact mean-difference
  * under catastrophic-cancellation inputs, degenerate-arm nulls, and the
  * zero-effect case. */
class WelchTTestSpec extends SparkSpec {

  private def arms(a: Seq[Long], b: Seq[Long]) = {
    import spark.implicits._
    (a.map(("a", _)) ++ b.map(("b", _))).toDF("arm", "v")
  }

  test("hand case: moments, Welch t and Satterthwaite df match a direct replay") {
    val (a, b) = (Seq(1L, 2L, 3L), Seq(2L, 4L, 6L, 8L))
    val r = Relational.welchTTest(arms(a, b), "arm", "v").head()
    assert(r.getAs[String]("arm_a") == "a" && r.getAs[String]("arm_b") == "b")
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 4L)
    assert(r.getAs[Double]("mean_a") == 2.0 && r.getAs[Double]("mean_b") == 5.0)
    assert(r.getAs[Double]("mean_diff") == -3.0)
    // sample variances: a -> 1; b -> ((4+16+36+64)*4 - 20^2)/(4*3) = 20/3
    assert(r.getAs[Double]("var_a") == 1.0)
    assert(r.getAs[Double]("var_b") == (120.0 * 4 - 400.0) / 12.0)
    val ra = 1.0 / 3.0
    val rb = ((120.0 * 4 - 400.0) / 12.0) / 4.0
    val se2 = ra + rb
    assert(r.getAs[Double]("t_stat") == -3.0 / math.sqrt(se2))
    assert(r.getAs[Double]("df_welch") ==
      (se2 * se2) / (ra * ra / 2.0 + rb * rb / 3.0))
  }

  test("exact mean difference survives a 1e9 offset (double means cancel)") {
    val base = 1000000000L
    val r = Relational.welchTTest(
      arms(Seq(base + 1, base + 2), Seq(base + 1, base + 3)), "arm", "v").head()
    // naive mean_a - mean_b in doubles loses the .5 at this magnitude
    assert(r.getAs[Double]("mean_diff") == -0.5)
  }

  test("identical arms: t exactly 0, not significant") {
    val r = Relational.welchTTest(
      arms(Seq(1L, 5L, 9L), Seq(1L, 5L, 9L)), "arm", "v").head()
    assert(r.getAs[Double]("mean_diff") == 0.0)
    assert(r.getAs[Double]("t_stat") == 0.0)
    assert(!r.getAs[Boolean]("significant"))
  }

  test("degenerate: constant arms null t/df; single-row arm nulls variance") {
    val c = Relational.welchTTest(
      arms(Seq(7L, 7L), Seq(3L, 3L)), "arm", "v").head()
    assert(c.isNullAt(c.fieldIndex("t_stat")))
    assert(c.isNullAt(c.fieldIndex("df_welch")))
    val s = Relational.welchTTest(
      arms(Seq(7L), Seq(3L, 4L)), "arm", "v").head()
    assert(s.isNullAt(s.fieldIndex("var_a")))
    assert(s.isNullAt(s.fieldIndex("t_stat")))
  }

  test("fractional metric: means/variances exact on the 2^-20 grid " +
      "(a decimal cast would HALF_UP-round 0.5 to 1)") {
    import spark.implicits._
    val df = (Seq(0.5, 1.5, 2.5).map(("a", _)) ++
      Seq(0.25, 0.75).map(("b", _))).toDF("arm", "v")
    val r = Relational.welchTTest(df, "arm", "v").head()
    // all inputs are exact multiples of 2^-20, so moments are exact
    assert(r.getAs[Double]("mean_a") == 1.5)
    assert(r.getAs[Double]("mean_b") == 0.5)
    assert(r.getAs[Double]("mean_diff") == 1.0)
    // sample variances: a -> ((0.25+2.25+6.25)*3 - 4.5^2)/(3*2) = 1.0
    //                   b -> ((0.0625+0.5625)*2 - 1.0)/(2*1) = 0.125
    assert(r.getAs[Double]("var_a") == 1.0)
    assert(r.getAs[Double]("var_b") == 0.125)
  }

  test("one arm only: no output row (the test is undefined)") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 2L)).toDF("arm", "v")
    assert(Relational.welchTTest(df, "arm", "v").count() == 0L)
  }
}
