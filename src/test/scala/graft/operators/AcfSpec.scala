package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ACF semantics: exact ±1 at the period of an alternating series,
  * constant-series null, per-type isolation, and agreement with the
  * cross-correlation lane on the self-pair. */
class AcfSpec extends SparkSpec {

  /** Build events where `etype` fires `counts(i)` times on day i. */
  private def events(etype: String, counts: Seq[Int], day0: Int = 0) = {
    import spark.implicits._
    counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)((etype, Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(day0 + i).atStartOfDay())))
    }.toDF("event_type", "ts")
  }

  test("alternating series: r(lag 2) = +1 and r(lag 1) = -1 (to fp sqrt tolerance)") {
    val df = events("x", Seq(1, 3, 1, 3, 1, 3, 1, 3))
    val r = Funnel.acfDaily(df, maxLag = 2).collect()
      .map(x => x.getAs[Long]("lag") -> x.getAs[Double]("r")).toMap
    assert(math.abs(r(2L) - 1.0) < 1e-12, s"lag2 ${r(2L)}")
    assert(math.abs(r(1L) + 1.0) < 1e-12, s"lag1 ${r(1L)}")
  }

  test("constant series: null r at every lag (zero variance)") {
    val df = events("x", Seq(5, 5, 5, 5, 5))
    val rows = Funnel.acfDaily(df, maxLag = 2).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.isNullAt(r.fieldIndex("r")), r.toString))
  }

  test("pair counts shrink by one per lag; types do not cross-contaminate") {
    val df = events("x", Seq(1, 2, 3, 4, 5))
      .unionAll(events("y", Seq(9, 9, 9), day0 = 100))
    val rows = Funnel.acfDaily(df, maxLag = 3).collect()
    val x = rows.filter(_.getAs[String]("event_type") == "x")
      .map(r => r.getAs[Long]("lag") -> r.getAs[Long]("n_pairs")).toMap
    assert(x == Map(1L -> 4L, 2L -> 3L, 3L -> 2L))
    // strictly increasing series: r = +1 at every lag
    rows.filter(_.getAs[String]("event_type") == "x").foreach { r =>
      assert(math.abs(r.getAs[Double]("r") - 1.0) < 1e-12)
    }
  }

  test("fixture: acf(type, lag) equals crossCorrelation(type, type) at that lag") {
    val ev = graft.sources.Tables.events(spark, sf)
    val acf = Funnel.acfDaily(ev, maxLag = 3).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("lag")) ->
        r.getAs[Double]("r")).toMap
    val types = acf.keys.map(_._1).toSeq.distinct.sorted.take(2)
    types.foreach { t =>
      val xc = Funnel.crossCorrelation(ev, t, t, maxLag = 3).collect()
        .map(r => r.getAs[Long]("lag") -> r.getAs[Double]("r")).toMap
      (1L to 3L).foreach { l =>
        assert(acf((t, l)) == xc(l), s"type $t lag $l")
      }
    }
  }
}
