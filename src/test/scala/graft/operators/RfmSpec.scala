package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** RFM semantics: hand-laddered quintiles, recency inversion, tie sharing,
  * and the grid-scored monetary dimension. */
class RfmSpec extends SparkSpec {

  // one event per (user, dayIndex, value)
  private def ev(rows: (Long, Int, Double)*) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((u, d, v), i) =>
      (u, i.toLong, Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(d).atStartOfDay()), v)
    }.toDF("user_id", "event_id", "ts", "value")
  }

  test("five users, distinct everything: scores are the identity ladder") {
    // user k: last day k, k+1 events, revenue 100*(k+1)
    val rows = (0 until 5).flatMap { k =>
      (0 to k).map(i => (k.toLong, k, 100.0 * (k + 1) / (k + 1)))
    } // k+1 events of value 100 each... simplify: value 100 per event
    val df = ev(rows.map { case (u, d, _) => (u, d, 100.0) }: _*)
    val got = Funnel.rfmSegments(df).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    // user 4: most recent (r=0), most events (5), most revenue -> "555"
    assert(got(4L).getAs[String]("segment") == "555")
    // user 0: r=4 (cum 5/5 -> quintile 5 -> inverted 1), f=1, m lowest
    assert(got(0L).getAs[String]("segment") == "111")
    // monotone: user k scores exactly (k+1) on f and m; 6-(5-k) on r
    (0 until 5).foreach { k =>
      val r = got(k.toLong)
      assert(r.getAs[Long]("score_f") == k + 1L, s"f of $k")
      assert(r.getAs[Long]("score_m") == k + 1L, s"m of $k")
      assert(r.getAs[Long]("score_r") == k + 1L, s"r of $k")
    }
  }

  test("ties share a ladder rung and a score") {
    val df = ev((1L, 0, 50.0), (2L, 0, 50.0), (3L, 0, 50.0), (4L, 0, 50.0))
    val got = Funnel.rfmSegments(df).collect()
    val segs = got.map(_.getAs[String]("segment")).distinct
    assert(segs.length == 1, segs.mkString(","))
  }

  test("monetary reports full 2^-20 precision but scores on the 1/16 grid") {
    // two users whose revenue differs only below 1/16 land on one m-rung
    val df = ev((1L, 0, 10.0), (2L, 0, 10.03))
    val got = Funnel.rfmSegments(df).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(got(1L).getAs[Long]("score_m") == got(2L).getAs[Long]("score_m"))
    assert(got(1L).getAs[Double]("m_revenue") != got(2L).getAs[Double]("m_revenue"))
  }
}
