package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Cohort-LTV semantics: hand grid with two cohorts, cumulative-per-member
  * arithmetic on the 2^-20 grid, and the observed-offset convention. */
class CohortLtvSpec extends SparkSpec {

  private val week0 = 1704067200L // 2024-01-01 (a Monday), week-truncated
  private def ev(rows: (Long, Long, Double)*) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((u, sec, v), i) =>
      (u, i.toLong, new Timestamp(sec * 1000L), v)
    }.toDF("user_id", "event_id", "ts", "value")
  }

  test("two cohorts: per-offset revenue and cumulative LTV replay by hand") {
    // cohort A (users 1,2) starts week0; user 1 returns in week0+1
    // cohort B (user 3) starts week0+1
    val df = ev(
      (1L, week0 + 10, 2.0), (2L, week0 + 20, 4.0),
      (1L, week0 + 604800 + 5, 6.0),
      (3L, week0 + 604800 + 9, 10.0))
    val got = Funnel.cohortLtv(df).collect()
      .map(r => (r.getAs[Long]("cohort_week"), r.getAs[Long]("offset_weeks")) -> r)
      .toMap
    val a0 = got((week0, 0L))
    assert(a0.getAs[Long]("cohort_n") == 2L && a0.getAs[Long]("n_active") == 2L)
    assert(a0.getAs[Double]("week_revenue") == 6.0)
    assert(a0.getAs[Double]("ltv_per_user") == 3.0)
    val a1 = got((week0, 1L))
    assert(a1.getAs[Long]("n_active") == 1L)
    assert(a1.getAs[Double]("week_revenue") == 6.0)
    assert(a1.getAs[Double]("ltv_per_user") == 6.0) // (6+6)/2
    val b0 = got((week0 + 604800L, 0L))
    assert(b0.getAs[Long]("cohort_n") == 1L)
    assert(b0.getAs[Double]("ltv_per_user") == 10.0)
    assert(got.size == 3)
  }

  test("silent week: observed-offset grain skips it; cumulative resumes") {
    val df = ev(
      (1L, week0 + 10, 1.0),
      (1L, week0 + 2 * 604800 + 10, 2.0)) // silent at offset 1
    val got = Funnel.cohortLtv(df).collect()
    assert(got.map(_.getAs[Long]("offset_weeks")).toSeq == Seq(0L, 2L))
    assert(got(1).getAs[Double]("ltv_per_user") == 3.0)
  }

  test("grid rounding: values land on floor(v * 2^20)") {
    // 1/3 is not grid-representable: floor(0.333... * 2^20) / 2^20
    val df = ev((1L, week0 + 10, 1.0 / 3.0))
    val r = Funnel.cohortLtv(df).head()
    val expected = math.floor((1.0 / 3.0) * 1048576.0) / 1048576.0
    assert(r.getAs[Double]("week_revenue") == expected)
  }
}
