package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Stickiness semantics: hand-checked windows, full-history-day gating,
  * and the exact-count ratios. */
class StickinessSpec extends SparkSpec {

  private def ev(rows: (Long, Int)*) = { // (user, dayIndex from 2024-01-01)
    import spark.implicits._
    rows.zipWithIndex.map { case ((u, d), i) =>
      (u, i.toLong, Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(d).atStartOfDay()), "x")
    }.toDF("user_id", "event_id", "ts", "event_type")
  }

  test("29-day span: only full-MAU-history days report; counts by hand") {
    // user 1 active every day 0..28; user 2 active only day 28
    val df = ev((1L to 1L).flatMap(u => (0 to 28).map(d => (u, d))) ++
      Seq((2L, 28)): _*)
    val rows = Funnel.stickiness(df).collect()
    // full 28-day windows ending at day 27 (covers 0..27) and day 28
    assert(rows.map(_.getAs[java.sql.Date]("day").toString).toSeq ==
      Seq("2024-01-28", "2024-01-29"))
    val d28 = rows(1)
    assert(d28.getAs[Long]("dau") == 2L)
    assert(d28.getAs[Long]("wau") == 2L)
    assert(d28.getAs[Long]("mau") == 2L)
    assert(d28.getAs[Double]("dau_mau") == 1.0)
    val d27 = rows(0)
    assert(d27.getAs[Long]("dau") == 1L && d27.getAs[Long]("mau") == 1L)
  }

  test("WAU window is 7 days: a visit 7 days back has aged out") {
    // user 2 visits day 21 only; window ending day 28 spans 22..28 -> out
    val df = ev(((0 to 28).map(d => (1L, d)) ++ Seq((2L, 21))): _*)
    val rows = Funnel.stickiness(df).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString -> r).toMap
    assert(rows("2024-01-29").getAs[Long]("wau") == 1L)
    assert(rows("2024-01-28").getAs[Long]("wau") == 2L) // spans 21..27
    assert(rows("2024-01-29").getAs[Long]("mau") == 2L) // 28-day still covers
  }
}
