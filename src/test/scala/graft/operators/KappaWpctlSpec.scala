package graft.operators

import graft.SparkSpec

/** Semantics for Cohen's kappa (hand-computed textbook grid, perfect/chance
  * agreement, the degenerate single-category case) and exact weighted
  * percentiles (hand ladder, weight-1 equivalence to plain percentiles,
  * boundary selection). */
class KappaWpctlSpec extends SparkSpec {

  private def raters(rows: (String, String)*) = {
    import spark.implicits._
    rows.toDF("a", "b")
  }

  test("kappa: textbook 2x2 — (20,5 / 10,15)") {
    // N=50 D=35 rowA=25,25 colB=30,20 -> E=25*30+25*20=1250
    // kappa = (50*35-1250)/(2500-1250) = 500/1250 = 0.4
    val rows = Seq.fill(20)(("x", "x")) ++ Seq.fill(5)(("x", "y")) ++
      Seq.fill(10)(("y", "x")) ++ Seq.fill(15)(("y", "y"))
    val r = Relational.cohensKappa(raters(rows: _*), "a", "b").collect().head
    assert(r.getAs[Long]("n_total") == 50L && r.getAs[Long]("d_agree") == 35L)
    assert(r.getAs[Double]("p_o") == 0.7)
    assert(r.getAs[Double]("p_e") == 1250.0 / 2500.0)
    assert(r.getAs[Double]("kappa") == 0.4)
  }

  test("kappa: perfect agreement is exactly 1; exact chance is 0") {
    val perfect = Seq.fill(30)(("x", "x")) ++ Seq.fill(20)(("y", "y"))
    val rp = Relational.cohensKappa(raters(perfect: _*), "a", "b")
      .collect().head
    assert(rp.getAs[Double]("kappa") == 1.0)
    // independent raters at 50/50: every cell 25 -> D=50=E/N exactly
    val chance = Seq.fill(25)(("x", "x")) ++ Seq.fill(25)(("x", "y")) ++
      Seq.fill(25)(("y", "x")) ++ Seq.fill(25)(("y", "y"))
    val rc = Relational.cohensKappa(raters(chance: _*), "a", "b")
      .collect().head
    assert(rc.getAs[Double]("kappa") == 0.0)
  }

  test("kappa: single category on both sides -> null, not a division error") {
    val r = Relational.cohensKappa(
      raters(Seq.fill(10)(("x", "x")): _*), "a", "b").collect().head
    assert(r.isNullAt(r.fieldIndex("kappa")))
    assert(r.getAs[Double]("p_o") == 1.0 && r.getAs[Double]("p_e") == 1.0)
  }

  private def wdf(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("v", "w")
  }

  test("weightedPercentiles: hand ladder") {
    // v=10 w=1, v=20 w=3, v=30 w=6  (W=10; cum: 1, 4, 10)
    // p25 -> ceil(2.5)=3 -> v=20 ; p50 -> 5 -> v=30 ; p99 -> 10 -> v=30
    val got = Relational.weightedPercentiles(
      wdf((10L, 1L), (20L, 3L), (30L, 6L)), "v", "w", Seq(25, 50, 99))
      .collect().map(r => r.getAs[Long]("p") -> r.getAs[Long]("value")).toMap
    assert(got == Map(25L -> 20L, 50L -> 30L, 99L -> 30L))
  }

  test("weightedPercentiles: unit weights equal the exact lower percentile") {
    val vals = Seq(5L, 1L, 9L, 3L, 7L, 2L, 8L, 4L, 6L, 10L)
    val got = Relational.weightedPercentiles(
      wdf(vals.map(v => (v, 1L)): _*), "v", "w", Seq(10, 50, 100))
      .collect().map(r => r.getAs[Long]("p") -> r.getAs[Long]("value")).toMap
    assert(got == Map(10L -> 1L, 50L -> 5L, 100L -> 10L))
  }

  test("weightedPercentiles: exact boundary picks the reaching value") {
    // W=4, p50 needs cw >= 2: v=1 has cw=2 exactly
    val got = Relational.weightedPercentiles(
      wdf((1L, 2L), (2L, 2L)), "v", "w", Seq(50, 51))
      .collect().map(r => r.getAs[Long]("p") -> r.getAs[Long]("value")).toMap
    assert(got == Map(50L -> 1L, 51L -> 2L))
  }

  test("weightedPercentiles: zero/negative weights are excluded") {
    val got = Relational.weightedPercentiles(
      wdf((1L, 0L), (2L, -5L), (3L, 4L)), "v", "w", Seq(50))
      .collect()
    assert(got.length == 1 && got.head.getAs[Long]("value") == 3L)
    assert(got.head.getAs[Long]("total_weight") == 4L)
  }
}
