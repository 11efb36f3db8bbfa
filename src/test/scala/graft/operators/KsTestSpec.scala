package graft.operators

import graft.SparkSpec

class KsTestSpec extends SparkSpec {
  import spark.implicits._

  test("ksTest: identical samples give D = 0, no rejection") {
    val df = (1 to 50).flatMap(v => Seq(("a", v), ("b", v)))
      .toDF("g", "v")
    val r = Relational.ksTest(df, "g", "v", "a", "b").first()
    assert(r.getAs[Long]("n_a") == 50L && r.getAs[Long]("n_b") == 50L)
    assert(r.getAs[Double]("d") == 0.0)
    assert(!r.getAs[Boolean]("reject_05"))
  }

  test("ksTest: disjoint supports give D = 1 and reject") {
    val df = ((1 to 40).map(v => ("a", v)) ++ (100 to 139).map(v => ("b", v)))
      .toDF("g", "v")
    val r = Relational.ksTest(df, "g", "v", "a", "b").first()
    assert(r.getAs[Double]("d") == 1.0)
    assert(r.getAs[Boolean]("reject_05"))
    // scaled stat = sqrt(n_a*n_b/(n_a+n_b)) when D = 1
    assert(math.abs(r.getAs[Double]("ks_scaled") -
      math.sqrt(40.0 * 40.0 / 80.0)) < 1e-12)
  }

  test("ksTest: D equals the known max ECDF gap on a hand-built case") {
    // a: {1,2,3,4}; b: {3,4,5,6} -> max gap at v=2: |2/4 - 0/4| = 0.5
    val df = (Seq(1, 2, 3, 4).map(("a", _)) ++ Seq(3, 4, 5, 6).map(("b", _)))
      .toDF("g", "v")
    val r = Relational.ksTest(df, "g", "v", "a", "b").first()
    assert(r.getAs[Double]("d") == 0.5)
  }

  test("ksTest ignores rows from other samples and handles ties") {
    val df = (Seq(1, 1, 2).map(("a", _)) ++ Seq(1, 2, 2).map(("b", _)) ++
      Seq(99).map(("c", _))).toDF("g", "v")
    val r = Relational.ksTest(df, "g", "v", "a", "b").first()
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
    // ECDFs: at v=1 a=2/3 b=1/3 gap 1/3; at v=2 both 1 -> D = 1/3
    assert(math.abs(r.getAs[Double]("d") - 1.0 / 3.0) < 1e-12)
  }
}
