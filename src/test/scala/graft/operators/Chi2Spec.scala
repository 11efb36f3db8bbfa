package graft.operators

import graft.SparkSpec

/** Chi-square independence semantics: hand-computed 2x2 grid, exact
  * independence -> zero statistic, margins, and Cramér's V bounds. */
class Chi2Spec extends SparkSpec {

  private def df(rows: (String, String)*) = {
    import spark.implicits._
    rows.toDF("r", "c")
  }

  test("hand-computed 2x2: cells and statistic") {
    // grid: (a,x)=30 (a,y)=10 (b,x)=10 (b,y)=30 ; N=80
    // margins: ra=40 rb=40 cx=40 cy=40; expected all 20
    // term each = (80*30 - 1600)^2/(80*40*40) = 800^2/128000 = 5.0 for
    // the 30-cells; (80*10-1600)^2/128000 = 5.0 too -> chi2 = 20
    val rows =
      Seq.fill(30)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(30)(("b", "y"))
    val cells = Relational.chi2Cells(df(rows: _*), "r", "c").collect()
    assert(cells.length == 4)
    cells.foreach { r =>
      assert(r.getAs[Double]("expected") == 20.0)
      assert(r.getAs[Double]("term") == 5.0)
    }
    val s = Relational.chi2Independence(df(rows: _*), "r", "c").collect().head
    assert(s.getAs[Long]("n_total") == 80L)
    assert(s.getAs[Long]("dof") == 1L)
    assert(s.getAs[Double]("chi2") == 20.0)
    // V = sqrt(20 / (80 * 1)) = 0.5
    assert(s.getAs[Double]("cramers_v") == 0.5)
  }

  test("exact independence: chi2 and V are exactly zero") {
    // counts proportional across rows: (a,x)=20 (a,y)=10, (b,x)=40 (b,y)=20
    val rows =
      Seq.fill(20)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(40)(("b", "x")) ++ Seq.fill(20)(("b", "y"))
    val s = Relational.chi2Independence(df(rows: _*), "r", "c").collect().head
    assert(s.getAs[Double]("chi2") == 0.0)
    assert(s.getAs[Double]("cramers_v") == 0.0)
  }

  test("perfect association: V is exactly 1 (zero cells contribute)") {
    val rows = Seq.fill(25)(("a", "x")) ++ Seq.fill(75)(("b", "y"))
    val cells = Relational.chi2Cells(df(rows: _*), "r", "c").collect()
    assert(cells.length == 4) // the grid is dense: (a,y) and (b,x) at n=0
    assert(cells.count(_.getAs[Long]("n") == 0L) == 2)
    val s = Relational.chi2Independence(df(rows: _*), "r", "c").collect().head
    assert(s.getAs[Double]("chi2") == 100.0)
    assert(s.getAs[Double]("cramers_v") == 1.0)
  }

  test("null categories are excluded; dof uses observed cardinalities") {
    import spark.implicits._
    val rows = Seq[(Option[String], Option[String])](
      (Some("a"), Some("x")), (Some("a"), Some("y")),
      (None, Some("x")), (Some("b"), None),
      (Some("b"), Some("x")), (Some("b"), Some("y"))).toDF("r", "c")
    val s = Relational.chi2Independence(rows, "r", "c").collect().head
    assert(s.getAs[Long]("n_total") == 4L)
    assert(s.getAs[Long]("n_rows") == 2L && s.getAs[Long]("n_cols") == 2L)
  }

  test("plan: grid joins are broadcast (category-grain frames), no SMJ") {
    val d = Relational.chi2Cells(
      graft.sources.Tables.events(spark, sf), "event_type", "user_id")
    val p = d.queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin"), p.take(1500))
    assert(!p.contains("ShuffledHashJoin"), p.take(1500))
  }
}
