package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Markov removal-effect semantics: hand chain with symmetric knockouts,
  * sole-converting-channel credit, and first-conversion path truncation. */
class MarkovAttributionSpec extends SparkSpec {

  private def ev(rows: (Long, Long, Long, String)*) = {
    import spark.implicits._
    rows.map { case (u, id, sec, t) =>
      (u, id, new Timestamp(sec * 1000L), t)
    }.toDF("user_id", "event_id", "ts", "event_type")
  }

  test("hand chain: symmetric a/b knockouts earn equal effects and 0.5 shares") {
    // START->a (2/3), START->b (1/3); a: conv 1/2, end 1/2; b: conv 1
    val df = ev(
      (1L, 1L, 1000L, "a"), (1L, 2L, 1060L, "purchase"),
      (2L, 3L, 1000L, "a"),
      (3L, 4L, 1000L, "b"), (3L, 5L, 1010L, "purchase"))
    val rows = Funnel.markovAttribution(df).collect()
      .map(r => r.getAs[String]("channel") -> r).toMap
    assert(rows.keySet == Set("a", "b"))
    assert(rows("a").getAs[Long]("n_visits") == 2L)
    assert(rows("b").getAs[Long]("n_visits") == 1L)
    val p = rows("a").getAs[Double]("p_conv")
    assert(math.abs(p - 2.0 / 3.0) < 1e-12)
    // both knockouts leave exactly one 1/3-weight converting path
    assert(rows("a").getAs[Double]("removal_effect") ==
      rows("b").getAs[Double]("removal_effect"))
    assert(rows("a").getAs[Double]("share") == 0.5)
    assert(rows("b").getAs[Double]("share") == 0.5)
  }

  test("sole converting channel: removal effect 1, share 1") {
    val df = ev(
      (1L, 1L, 1000L, "a"), (1L, 2L, 1060L, "purchase"),
      (2L, 3L, 1000L, "a"), (2L, 4L, 1050L, "purchase"))
    val r = Funnel.markovAttribution(df).collect()
    assert(r.length == 1 && r.head.getAs[String]("channel") == "a")
    assert(r.head.getAs[Double]("p_conv") == 1.0)
    assert(r.head.getAs[Double]("p_conv_removed") == 0.0)
    assert(r.head.getAs[Double]("removal_effect") == 1.0)
    assert(r.head.getAs[Double]("share") == 1.0)
  }

  test("paths truncate at the FIRST conversion: later events join no path") {
    val df = ev(
      (1L, 1L, 1000L, "a"), (1L, 2L, 1010L, "purchase"),
      (1L, 3L, 1020L, "b"), (1L, 4L, 1030L, "purchase"))
    val rows = Funnel.markovAttribution(df).collect()
    assert(rows.map(_.getAs[String]("channel")).toSet == Set("a"))
  }

  test("multi-hop chain: a->b->conv credits BOTH hops fully") {
    val df = ev(
      (1L, 1L, 1000L, "a"), (1L, 2L, 1010L, "b"), (1L, 3L, 1020L, "purchase"))
    val rows = Funnel.markovAttribution(df).collect()
      .map(r => r.getAs[String]("channel") -> r).toMap
    // the only path runs through both: each knockout kills conversion
    assert(rows("a").getAs[Double]("removal_effect") == 1.0)
    assert(rows("b").getAs[Double]("removal_effect") == 1.0)
    assert(rows("a").getAs[Double]("share") == 0.5)
  }
}
