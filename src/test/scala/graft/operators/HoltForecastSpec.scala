package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Holt linear-trend semantics: the hand-replayed recurrence, linear-series
  * trend recovery, the single-day degenerate, and day-order dependence. */
class HoltForecastSpec extends SparkSpec {

  private def events(etype: String, counts: Seq[Int]) = {
    import spark.implicits._
    counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)((etype, Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(i).atStartOfDay())))
    }.toDF("event_type", "ts")
  }

  test("hand replay: identical double fold over [1,2,4,7]") {
    val r = Funnel.holtForecast(events("x", Seq(1, 2, 4, 7))).head()
    var l = 1.0; var t = 2.0 - 1.0
    for (x <- Seq(2.0, 4.0, 7.0)) {
      val lNew = 0.2 * x + 0.8 * (l + t)
      t = 0.1 * (lNew - l) + 0.9 * t
      l = lNew
    }
    assert(r.getAs[Long]("n_days") == 4L)
    assert(r.getAs[Double]("level") == l)
    assert(r.getAs[Double]("trend") == t)
    assert(r.getAs[Double]("fc_1") == l + 1.0 * t)
    assert(r.getAs[Double]("fc_7") == l + 7.0 * t)
  }

  test("linear series: level tracks the series and trend recovers the slope") {
    val r = Funnel.holtForecast(events("x", Seq(1, 3, 5, 7, 9, 11))).head()
    assert(math.abs(r.getAs[Double]("level") - 11.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("trend") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("fc_7") - (11.0 + 14.0)) < 1e-9)
  }

  test("single-day series: flat forecast, zero trend") {
    val r = Funnel.holtForecast(events("x", Seq(5))).head()
    assert(r.getAs[Long]("n_days") == 1L)
    assert(r.getAs[Double]("level") == 5.0)
    assert(r.getAs[Double]("trend") == 0.0)
    assert(r.getAs[Double]("fc_7") == 5.0)
  }

  test("fold is day-ORDERED: reversing the series flips the trend sign") {
    val up = Funnel.holtForecast(events("x", Seq(1, 2, 4, 8))).head()
    val dn = Funnel.holtForecast(events("x", Seq(8, 4, 2, 1))).head()
    assert(up.getAs[Double]("trend") > 0.0)
    assert(dn.getAs[Double]("trend") < 0.0)
  }
}
