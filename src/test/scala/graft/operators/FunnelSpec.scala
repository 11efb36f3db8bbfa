package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** Semantic units for the event-analytics and privacy lanes (the oracle
  * proves engine parity; these pin the SEMANTICS on hand-built inputs). */
class FunnelSpec extends SparkSpec {

  private def ev(rows: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((u, tpe, ts), i) =>
      (i.toLong, Timestamp.valueOf(ts), u, tpe, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("funnel: ordered steps only — a purchase BEFORE the click never counts") {
    val events = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 11:00:00"),
      (1L, "purchase", "2024-01-01 12:00:00"), // converts fully
      (2L, "view", "2024-01-01 10:00:00"),
      (2L, "purchase", "2024-01-01 10:30:00"), // purchase precedes click
      (2L, "click", "2024-01-01 11:00:00"),
      (3L, "click", "2024-01-01 09:00:00"), // click without view: stage 1 miss
      (3L, "purchase", "2024-01-01 10:00:00"))
    val got = Funnel.conversionFunnel(events).collect()
      .map(r => (r.getAs[Long]("stage"), r.getAs[Long]("n_users"))).toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 1L))
  }

  test("funnel: the conversion window bounds each stage hop") {
    val events = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-20 10:00:00"), // 19 days after view: outside 7d
      (2L, "view", "2024-01-01 10:00:00"),
      (2L, "click", "2024-01-03 10:00:00")) // inside
    val got = Funnel.conversionFunnel(events).collect()
      .map(r => (r.getAs[Long]("stage"), r.getAs[Long]("n_users"))).toMap
    assert(got(1L) === 2L && got(2L) === 1L)
  }

  test("retention: offsets count from each user's own first week") {
    val events = ev(
      (1L, "view", "2024-01-01 10:00:00"), // Monday, week W0
      (1L, "view", "2024-01-09 10:00:00"), // week W0+1
      (2L, "view", "2024-01-08 10:00:00"), // first seen W0+1
      (2L, "view", "2024-01-16 10:00:00")) // their offset 1
    val got = Funnel.cohortRetention(events).collect()
      .map(r => ((r.getAs[Long]("cohort_week"), r.getAs[Long]("offset_weeks")),
        (r.getAs[Long]("n_active"), r.getAs[Long]("cohort_n"))))
      .toMap
    val w0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
    val w1 = w0 + 604800
    assert(got((w0, 0L)) === ((1L, 1L)))
    assert(got((w0, 1L)) === ((1L, 1L)))
    assert(got((w1, 0L)) === ((1L, 1L)))
    assert(got((w1, 1L)) === ((1L, 1L)))
  }

  test("interpolate: midpoints are exact; edges extrapolate flat") {
    val events = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "view", "2024-01-01 14:00:00"))
      .withColumn("value",
        when(col("event_id") === 0, 10.0).otherwise(30.0))
    val got = Resample.interpolate(events, 3600L).collect()
      .map(r => r.getAs[Long]("slot_sec") -> r.getAs[Double]("interp_value")).toMap
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00").getTime / 1000
    assert(got(t0) === 10.0)           // on the observation
    assert(got(t0 + 3600) === 15.0)    // quarter of the way
    assert(got(t0 + 2 * 3600) === 20.0)
    assert(got(t0 + 3 * 3600) === 25.0)
    assert(got(t0 + 4 * 3600) === 30.0)
  }

  test("kAnonymize: every surviving class of level <= 1 has >= k members; total preserved") {
    val cust = Tables.customer(spark, sf)
    val out = Validate.kAnonymize(cust, "c_nationkey", "c_mktsegment", 10L)
    val rows = out.collect()
    rows.filter(_.getAs[Long]("level") <= 1L)
      .foreach(r => assert(r.getAs[Long]("n") >= 10L, r.toString))
    assert(rows.map(_.getAs[Long]("n")).sum === cust.count())
  }

  test("sqTopK with rerank = corpus recovers the exact brute-force top-k") {
    val emb = Tables.embeddings(spark, sf).limit(60)
    val n = emb.count().toInt
    val brute = Similarity.bruteForceTopK(emb, nQueries = 3, k = 4)
      .select("q_id", "rk", "n_id").collect().toSeq
    val sq = Similarity.sqTopK(emb, nQueries = 3, k = 4, rerank = n)
      .select("q_id", "rk", "n_id").collect().toSeq
    assert(sq === brute)
  }

  test("volumeTrend: hand-built rising and flat series get the right slope and verdict") {
    import spark.implicits._
    // 'up': 10,20,30,40 events on days 0..3 (slope 10); 'flat': 20 each day
    val rows = (0 until 4).flatMap { d =>
      val day = Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00")
      (0 until (10 + 10 * d)).map(i => (d * 1000L + i, day, "up")) ++
        (0 until 20).map(i => (d * 1000L + 500 + i, day, "flat"))
    }
    val ev = rows.toDF("event_id", "ts", "user_id_ignored")
      .withColumnRenamed("user_id_ignored", "event_type")
      .withColumn("user_id", col("event_id"))
    val got = Funnel.volumeTrend(ev).collect()
      .map(r => r.getString(0) -> (r.getAs[Double]("slope"),
        r.getString(r.fieldIndex("verdict")))).toMap
    assert(math.abs(got("up")._1 - 10.0) < 1e-12 && got("up")._2 == "growing")
    assert(math.abs(got("flat")._1) < 1e-12 && got("flat")._2 == "flat")
  }

  test("transitionMatrix: hand-built sequences count adjacent pairs; rows sum to 1") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    // user 1: a->b->a->b ; user 2: a->b (pairs: a->b x3, b->a x1)
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 00:00:01"), "a"), (2L, 1L, ts("2024-01-01 00:00:02"), "b"),
      (3L, 1L, ts("2024-01-01 00:00:03"), "a"), (4L, 1L, ts("2024-01-01 00:00:04"), "b"),
      (5L, 2L, ts("2024-01-01 00:00:01"), "a"), (6L, 2L, ts("2024-01-01 00:00:02"), "b"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = Funnel.transitionMatrix(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getAs[Double]("p")))
      .toMap
    assert(got(("a", "b")) == (3L, 1.0))
    assert(got(("b", "a")) == (1L, 1.0))
    assert(got.size == 2)
  }

  test("spearman: monotone relation scores exactly 1, reversed exactly -1") {
    import spark.implicits._
    val up = (1 to 50).map(i => ("g", i.toDouble, (i * i).toDouble))
    val down = (1 to 50).map(i => ("h", i.toDouble, (100 - i).toDouble))
    val df = (up ++ down).toDF("grp", "x", "y")
    val got = Relational.spearmanBy(df, "grp", "x", "y").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("spearman_rho")).toMap
    // sqrt(a)*sqrt(b) rounds one ulp off sqrt(ab): tolerance is IEEE, not
    // semantic (cross-engine exactness is the oracle's job)
    assert(math.abs(got("g") - 1.0) < 1e-12, s"monotone ~1, got ${got("g")}")
    assert(math.abs(got("h") + 1.0) < 1e-12, s"reversed ~-1, got ${got("h")}")
  }

  test("spearman: value-grain rank-map form bit-identical to the row-grain-window twin") {
    val li = graft.sources.Tables.lineitem(spark, sf)
    val now = Relational.spearmanBy(li, "l_returnflag",
      "l_quantity", "l_extendedprice").collect().toSeq
    val old = Relational.spearmanByWindow(li, "l_returnflag",
      "l_quantity", "l_extendedprice").collect().toSeq
    assert(now.nonEmpty && now.size == old.size)
    now.zip(old).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0) && a.getLong(1) == b.getLong(1),
        s"group/n mismatch: $a vs $b")
      assert(java.lang.Double.doubleToRawLongBits(a.getAs[Double]("spearman_rho")) ==
        java.lang.Double.doubleToRawLongBits(b.getAs[Double]("spearman_rho")),
        s"rho bits differ: $a vs $b")
    }
  }

  test("spearman: null groups and null values match the window twin (null-safe joins)") {
    import spark.implicits._
    val rows = Seq[(String, java.lang.Double, java.lang.Double)](
      ("g", 1.0, 2.0), ("g", 2.0, 1.0), ("g", null, 3.0), ("g", 3.0, null),
      ("g", 4.0, 4.0),
      (null, 1.0, 1.0), (null, 2.0, 3.0), (null, null, null), (null, 3.0, 2.0),
      ("h", 5.0, 5.0), ("h", 6.0, 7.0), ("h", 7.0, 6.0))
    val df = rows.toDF("grp", "x", "y")
    val now = Relational.spearmanBy(df, "grp", "x", "y").collect().toSeq
    val old = Relational.spearmanByWindow(df, "grp", "x", "y").collect().toSeq
    assert(now.size == old.size && now.size == 3,
      s"expected 3 groups incl. null: ${now.size} vs ${old.size}")
    now.zip(old).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0) && a.getLong(1) == b.getLong(1),
        s"group/n mismatch on null-bearing input: $a vs $b")
      val (ra, rb) = (a.getAs[Double]("spearman_rho"), b.getAs[Double]("spearman_rho"))
      assert(java.lang.Double.doubleToRawLongBits(ra) ==
        java.lang.Double.doubleToRawLongBits(rb), s"rho bits differ: $a vs $b")
    }
    // the null group must carry ALL its rows (n=4), not drop them
    assert(now.find(_.isNullAt(0)).exists(_.getLong(1) == 4L))
  }

  test("invertedIndex: postings sorted, capped, df keeps the true count") {
    import spark.implicits._
    // 'common' in 30 docs (cap 20 postings), 'rare' in 2 (below minDf)
    val docs = (0 until 30).map(i =>
      (i.toLong, "common " + (if (i < 2) "rare" else "filler" + i)))
      .toDF("doc_id", "text")
    val got = TfIdf.invertedIndex(docs, minDf = 5, maxPostings = 20).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got.contains("common") && !got.contains("rare"))
    val (df0, postings) = got("common")
    assert(df0 == 30L) // true df, not the cap
    val ids = postings.split(",").map(_.toLong).toSeq
    assert(ids.length == 20 && ids == ids.sorted && ids.head == 0L)
  }

  test("rollingDistinctUsers: hand-built days give the right trailing-window counts") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    // user 1 on day 1 and 10; user 2 on day 3 — 7-day windows
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 08:00:00"), "view"),
      (2L, 1L, ts("2024-01-10 08:00:00"), "view"),
      (3L, 2L, ts("2024-01-03 08:00:00"), "view"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = Funnel.rollingDistinctUsers(ev).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(got("2024-01-01") == 1L) // only user 1 so far
    assert(got("2024-01-03") == 2L) // users 1 and 2 within 7 days
    assert(got("2024-01-09") == 1L) // day-1 visit aged out (window 3..9)
    assert(got("2024-01-10") == 1L) // user 1 returns; user 2's day 3 < window 4..10
  }

  test("benfordAudit: exponentially distributed values conform; chi2 terms sane") {
    import spark.implicits._
    // a geometric sequence is the textbook Benford-conforming input; ratio
    // 1.01 keeps 4000 distinct values inside the decimal(28,6) domain
    val vals = (0 until 4000).map(k => math.pow(1.01, k)).toDF("o_totalprice")
    val rows = Validate.benfordAudit(vals, "o_totalprice").collect()
    assert(rows.length == 9)
    val chi2 = rows.map(_.getAs[Double]("chi2_term")).sum
    assert(chi2 >= 0.0 && chi2 < 15.51, s"geometric must pass the screen: $chi2")
    assert(rows.map(_.getAs[Long]("n_obs")).sum == 4000L)
  }

  test("ewmaDaily: closed form equals the textbook recursion exactly") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    // one type, counts 4, 8, 2, 6 on consecutive days
    val counts = Seq(4, 8, 2, 6)
    val ev = counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i =>
        ((d * 100 + i).toLong, 1L, ts(f"2024-01-${d + 1}%02d 12:00:00"), "a"))
    }.toDF("event_id", "user_id", "ts", "event_type")
    val got = Funnel.ewmaDaily(ev).collect().map(_.getAs[Double]("ewma")).toSeq
    // s_0=4; s_1=(8+4)/2=6; s_2=(2+6)/2=4; s_3=(6+4)/2=5 — exact halves
    assert(got == Seq(4.0, 6.0, 4.0, 5.0), got.toString)
  }

  test("abTest: planted conversion imbalance yields the right z sign and significance") {
    import spark.implicits._
    def ts0 = Timestamp.valueOf("2024-01-01 00:00:00")
    // arm 0 (even ids): 90/100 users convert; arm 1 (odd): 10/100
    val rows = (0 until 200).flatMap { u =>
      val converts = if (u % 2 == 0) u < 180 else u < 20
      val purchases = if (converts) 15 else 0
      (0 until purchases).map(i => (u * 1000L + i, u.toLong, ts0, "purchase")) :+
        ((u * 1000L + 999, u.toLong, ts0, "view"))
    }
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type")
    val r = Funnel.abTest(ev).collect().head
    assert(r.getAs[Long]("n_a") == 100L && r.getAs[Long]("n_b") == 100L)
    assert(r.getAs[Double]("p_a") == 0.9 && r.getAs[Double]("p_b") == 0.1)
    assert(r.getAs[Double]("z") > 1.96 && r.getAs[Boolean]("significant"))
  }

  test("abTest: degenerate pool (everyone converts) yields NULL z, no abort") {
    import spark.implicits._
    def ts0 = Timestamp.valueOf("2024-01-01 00:00:00")
    // every user in both arms crosses the threshold -> p_pool = 1.0; under
    // ANSI mode the unguarded z division ABORTED the query (hit for real by
    // the sf1 decade probe where 10x-busier users all convert)
    val rows = (0 until 20).flatMap { u =>
      (0 until 15).map(i => (u * 1000L + i, u.toLong, ts0, "purchase"))
    }
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type")
    val r = Funnel.abTest(ev).collect().head
    assert(r.getAs[Double]("p_pool") == 1.0)
    assert(r.isNullAt(r.fieldIndex("z")))
    assert(r.isNullAt(r.fieldIndex("significant")))
  }

  test("survivalCurve: hand-built KM — risk ladder, censoring, product-limit") {
    import spark.implicits._
    // horizon = 2020-12-31; churnAfterDays = 10
    // A,B: t=10 churned; C: t=5 churned; D: t=30 censored (alive at horizon);
    // E: t=10 censored (same duration as churners A,B)
    val rows = Seq(
      ("A", "2020-01-01"), ("A", "2020-01-11"),
      ("B", "2020-01-01"), ("B", "2020-01-11"),
      ("C", "2020-01-01"), ("C", "2020-01-06"),
      ("D", "2020-12-01"), ("D", "2020-12-31"),
      ("E", "2020-12-21"), ("E", "2020-12-31"))
    val df = rows.toDF("subj", "d")
      .withColumn("d", col("d").cast("timestamp"))
    val got = Funnel.survivalCurve(df, "subj", "d", churnAfterDays = 10)
      .collect()
      .map(r => (r.getAs[Long]("t_days"), r.getAs[Long]("n_risk"),
        r.getAs[Long]("d_events"), r.getAs[Long]("c_censored"),
        r.getAs[Double]("survival")))
    // t=5: 5 at risk, 1 event -> S=0.8; t=10: 4 at risk, 2 events,
    // 1 censored alongside -> S=0.8*(2/4)=0.4; t=30: no event, no row
    assert(got.toSeq === Seq(
      (5L, 5L, 1L, 0L, 0.8),
      (10L, 4L, 2L, 1L, 0.8 * (2.0 / 4.0))))
  }

  test("survivalCurve: monotone non-increasing, in (0,1]; all-censored input is empty") {
    val got = Funnel.survivalCurve(
      Tables.orders(spark, sf), "o_custkey", "o_orderdate", 365)
      .collect().map(_.getAs[Double]("survival"))
    assert(got.nonEmpty)
    assert(got.forall(s => s > 0.0 && s <= 1.0))
    assert(got.sliding(2).forall { case Array(a, b) => b <= a; case _ => true })
    // churnAfterDays past the whole span -> nothing can churn -> empty curve
    val none = Funnel.survivalCurve(
      Tables.orders(spark, sf), "o_custkey", "o_orderdate", 100000)
    assert(none.count() == 0L)
  }
}
