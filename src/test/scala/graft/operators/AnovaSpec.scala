package graft.operators

import graft.SparkSpec

/** One-way ANOVA semantics: hand-computed F on a textbook example, zero
  * between-variance degenerate case, null hygiene, and the decimal
  * overflow guard at long-range values. */
class AnovaSpec extends SparkSpec {

  private def df(rows: (String, Long)*) = {
    import spark.implicits._
    rows.toDF("g", "v")
  }

  test("textbook two-group F") {
    // A: 1,2,3 (mean 2); B: 4,5,6 (mean 5); grand 3.5
    // SSB = 3*(1.5)^2 * 2 = 13.5 ; SSW = 2 + 2 = 4
    // F = (13.5/1) / (4/4) = 13.5 ; eta^2 = 13.5/17.5
    val r = Relational.anovaOneWay(
      df(("A", 1L), ("A", 2L), ("A", 3L), ("B", 4L), ("B", 5L), ("B", 6L)),
      "g", "v").collect().head
    assert(r.getAs[Long]("k") == 2L)
    assert(r.getAs[Long]("n_total") == 6L)
    assert(r.getAs[Double]("ssb") == 13.5)
    assert(r.getAs[Double]("ssw") == 4.0)
    assert(r.getAs[Double]("f_stat") == 13.5)
    assert(r.getAs[Double]("eta_sq") == 13.5 / 17.5)
  }

  test("identical group means: SSB and F exactly 0") {
    val r = Relational.anovaOneWay(
      df(("A", 1L), ("A", 3L), ("B", 0L), ("B", 4L), ("C", 2L), ("C", 2L)),
      "g", "v").collect().head
    assert(r.getAs[Double]("ssb") == 0.0)
    assert(r.getAs[Double]("f_stat") == 0.0)
  }

  test("null group or value rows are excluded, not crashed on") {
    import spark.implicits._
    val rows = Seq[(Option[String], Option[Long])](
      (Some("A"), Some(1L)), (Some("A"), Some(3L)),
      (None, Some(99L)), (Some("B"), None),
      (Some("B"), Some(2L)), (Some("B"), Some(4L)))
      .toDF("g", "v")
    val r = Relational.anovaOneWay(rows, "g", "v").collect().head
    assert(r.getAs[Long]("k") == 2L)
    assert(r.getAs[Long]("n_total") == 4L)
  }

  test("long-range values do not overflow the squared moment") {
    // x ~ 3e9: x*x overflows a LONG (9e18 ceiling) — decimal(19,0)
    // operands keep it exact; SSW must come out exactly 2+2=4
    val base = 3000000000L
    val r = Relational.anovaOneWay(
      df(("A", base), ("A", base + 2), ("B", base + 10), ("B", base + 12)),
      "g", "v").collect().head
    assert(r.getAs[Double]("ssw") == 4.0)
    assert(r.getAs[Double]("ssb") == 100.0) // 2*(5)^2 * 2
  }

  test("zero total variance: F is null, not an ANSI division error") {
    val r = Relational.anovaOneWay(
      df(("A", 5L), ("A", 5L), ("B", 5L), ("B", 5L)), "g", "v")
      .collect().head
    assert(r.isNullAt(r.fieldIndex("f_stat")))
    assert(r.isNullAt(r.fieldIndex("eta_sq")))
    assert(r.getAs[Double]("ssw") == 0.0 && r.getAs[Double]("ssb") == 0.0)
  }

  test("plan: one grouped aggregate, no join, no window") {
    val d = Relational.anovaOneWay(
      graft.sources.Tables.documents(spark, sf), "lang", "n_chars")
    val p = d.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p.take(1500))
    assert(!p.contains("Window"), p.take(1500))
  }
}
