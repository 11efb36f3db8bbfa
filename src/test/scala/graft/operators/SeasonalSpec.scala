package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class SeasonalSpec extends SparkSpec {
  import spark.implicits._

  // 28 days of a planted series: constant base 100, dow effect +30 on
  // epoch-dow 0, -10 on epoch-dow 3, flat otherwise; one event row per count
  private def planted = {
    val rows = for {
      d <- 0 until 28
      dow = (18262 + d) % 7 // 2020-01-01 is epoch day 18262
      n = 100 + (if (dow == 0) 30 else if (dow == 3) -10 else 0)
      i <- 0 until n
    } yield (i.toLong, Timestamp.valueOf(f"2020-01-${d + 1}%02d 12:00:00"),
      1L, "click", 0.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("decomposition recovers a planted weekly pattern") {
    val out = Funnel.seasonalDecompose(planted).collect()
    // 28 days minus 3 on each edge
    assert(out.length == 22)
    out.foreach { r =>
      val n = r.getAs[Long]("n").toDouble
      val trend = r.getAs[Double]("trend")
      val seasonal = r.getAs[Double]("seasonal")
      val residual = r.getAs[Double]("residual")
      // additive identity n = trend + seasonal + residual (up to ulps)
      assert(math.abs(n - (trend + seasonal + residual)) < 1e-9)
      // constant-base series: trend is the weekly mean everywhere
      assert(math.abs(trend - (700.0 + 30.0 - 10.0) / 7.0) < 1e-9)
      val dow = r.getAs[Long]("dow")
      val expect = (if (dow == 0) 30.0 else if (dow == 3) -10.0 else 0.0) -
        20.0 / 7.0 // seasonal is centered by the trend's weekly mean shift
      assert(math.abs(seasonal - expect) < 1e-9, s"dow $dow: $seasonal")
      assert(math.abs(residual) < 1e-9)
    }
  }

  test("days without a full centered window are cut, not padded") {
    val out = Funnel.seasonalDecompose(planted)
      .select("day").as[java.sql.Date].collect().map(_.toString)
    assert(!out.contains("2020-01-01") && !out.contains("2020-01-28"))
    assert(out.contains("2020-01-04") && out.contains("2020-01-25"))
  }
}
