package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class DriftTimelineSpec extends SparkSpec {
  import spark.implicits._

  private def ev(day: Int, t: String, n: Int) =
    (1 to n).map(i =>
      (day * 1000L + i, Timestamp.valueOf(f"2024-02-$day%02d 10:00:00"), t))

  test("a day repeating the reference mix has tv = 0; a disjoint day tv = 1") {
    val rows = (
      (1 to 7).flatMap(d => ev(d, "a", 6) ++ ev(d, "b", 2)) ++ // reference
        ev(8, "a", 3) ++ ev(8, "b", 1) ++                      // same 3:1 mix
        ev(9, "c", 5)                                          // disjoint
      ).toDF("event_id", "ts", "event_type")
    val r = Funnel.driftTimeline(rows, refDays = 7).collect()
      .map(x => x.getDate(0).toString ->
        (x.getBoolean(2), x.getDouble(3))).toMap
    assert(r("2024-02-08") == ((false, 0.0)))
    assert(r("2024-02-09") == ((false, 1.0)))
    assert(r("2024-02-03")._1, "reference day flagged")
    assert(r("2024-02-03")._2 == 0.0, "uniform reference days match the mix")
  }

  test("hand-computed mixed day") {
    // ref: a=8, b=8 (p = 1/2, 1/2); day 9: a=3, b=1 (q = 3/4, 1/4)
    // tv = 0.5 * (|3/4-1/2| + |1/4-1/2|) = 0.25
    val rows = (
      (1 to 7).flatMap(d => ev(d, "a", 8) ++ ev(d, "b", 8)).map(t => t) ++
        ev(9, "a", 3) ++ ev(9, "b", 1)
      ).toDF("event_id", "ts", "event_type")
    val r = Funnel.driftTimeline(rows, refDays = 7).collect()
      .find(_.getDate(0).toString == "2024-02-09").get
    assert(r.getDouble(3) == 0.25)
  }

  test("crossCorrelation: a shifted copy correlates perfectly at its lag") {
    // b(t) = a(t-2): r = 1.0 exactly at lag -2 (b_day = a_day + (-2)
    // aligns b's copy of a's value back onto a)
    val rows = ((1 to 20).flatMap(d => ev(d, "a", d * 3 % 11 + 1)) ++
      (3 to 22).flatMap(d => ev(d, "b", (d - 2) * 3 % 11 + 1)))
      .toDF("event_id", "ts", "event_type")
    val r = Funnel.crossCorrelation(rows, "a", "b", maxLag = 3).collect()
      .map(x => x.getLong(0) -> x).toMap
    // sqrt(x)*sqrt(x) rounds one ulp below x — perfect correlation
    // lands within an ulp of 1, deterministically
    assert(r(2L).getAs[Double]("r") > 1.0 - 1e-12)
    assert(math.abs(r(0L).getAs[Double]("r")) < 1.0)
  }

  test("crossCorrelation: constant series yields NULL r, not NaN") {
    val rows = ((1 to 10).flatMap(d => ev(d, "a", 5)) ++
      (1 to 10).flatMap(d => ev(d, "b", d))).toDF("event_id", "ts", "event_type")
    val r = Funnel.crossCorrelation(rows, "a", "b", maxLag = 1).collect()
    r.foreach(x => assert(x.isNullAt(2), s"lag ${x.getLong(0)}"))
  }

  test("partition invariance") {
    val rows = (1 to 10).flatMap(d =>
      ev(d, "a", d) ++ ev(d, "b", 11 - d) ++ (if (d > 5) ev(d, "c", d) else Nil))
      .toDF("event_id", "ts", "event_type")
    def run(p: Int) = Funnel.driftTimeline(rows.repartition(p))
      .collect().map(_.toSeq).toSeq
    assert(run(1) == run(13))
  }
}
