package graft.operators

import graft.SparkSpec

/** IPF-raking semantics: balanced input is a fixed point, the classic 2x2
  * fit hits both margins while preserving the cross-product ratio (the IPF
  * invariant), and the fixture mixture converges to equal shares. */
class RakeMixtureSpec extends SparkSpec {

  private def docs(rows: (String, String, Int)*) = {
    import spark.implicits._
    rows.flatMap { case (a, b, k) => Seq.fill(k)((a, b)) }.toDF("la", "src")
  }

  test("already-balanced grid: weights exactly 1, margins exactly on target") {
    // rows sum 4/4, cols sum 4/4 with targets 4/4 — IPF is an exact no-op
    val df = docs(("x", "p", 1), ("x", "q", 3), ("y", "p", 3), ("y", "q", 1))
    val got = Sampling.rakeMixture(df, "la", "src").collect()
    got.foreach { r =>
      assert(r.getAs[Double]("weight") == 1.0, r.toString)
      assert(r.getAs[Double]("margin_a") == 4.0)
      assert(r.getAs[Double]("margin_b") == 4.0)
    }
  }

  test("asymmetric 2x2: both margins fit; cross-product ratio is preserved") {
    val df = docs(("x", "p", 2), ("x", "q", 1), ("y", "p", 1), ("y", "q", 1))
    val got = Sampling.rakeMixture(df, "la", "src").collect()
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b")) -> r).toMap
    got.values.foreach { r =>
      assert(math.abs(r.getAs[Double]("margin_a") - 2.5) < 1e-9, r.toString)
      assert(math.abs(r.getAs[Double]("margin_b") - 2.5) < 1e-9, r.toString)
    }
    def f(a: String, b: String) = got((a, b)).getAs[Double]("fitted")
    val ratio = (f("x", "p") * f("y", "q")) / (f("x", "q") * f("y", "p"))
    // n-cross-ratio = (2*1)/(1*1) = 2 — IPF never changes it
    assert(math.abs(ratio - 2.0) < 1e-9, ratio.toString)
  }

  test("fixture mixture: margins converge to equal shares per dimension") {
    val df = graft.sources.Tables.documents(spark, sf)
    val got = Sampling.rakeMixture(df, "lang", "source").collect()
    val nTot = got.map(r => r.getAs[Long]("n")).sum
    val nLang = got.map(_.getAs[String]("a")).distinct.length
    val nSrc = got.map(_.getAs[String]("b")).distinct.length
    got.foreach { r =>
      assert(math.abs(r.getAs[Double]("margin_a") - nTot.toDouble / nLang) < 1e-6)
      assert(math.abs(r.getAs[Double]("margin_b") - nTot.toDouble / nSrc) < 1e-6)
      assert(r.getAs[Double]("weight") > 0.0)
    }
  }
}
