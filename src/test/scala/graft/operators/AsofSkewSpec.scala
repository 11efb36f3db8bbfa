package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.sources.Tables

class AsofSkewSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join picks the latest right row at or before each event") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (1L, 7L, ts("1995-06-01 00:00:00")),
      (2L, 7L, ts("1997-01-01 00:00:00")),
      (3L, 8L, ts("1995-01-01 00:00:00"))   // user with no prior order
    ).toDF("event_id", "user_id", "ts")
    val orders = Seq(
      (100L, 7L, ts("1995-01-01 00:00:00"), 10.0),
      (200L, 7L, ts("1996-05-05 00:00:00"), 20.0),
      (300L, 9L, ts("1990-01-01 00:00:00"), 30.0)
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val r = AsofJoin.eventsToLatestOrder(events, orders).collect()
    assert(r(0).getLong(3) == 100L)          // event 1 -> order of 1995-01-01
    assert(r(1).getLong(3) == 200L)          // event 2 -> order of 1996-05-05
    assert(r(2).isNullAt(3))                 // user 8: no order -> null (left)
  }

  test("as-of tie at equal timestamps matches (<= semantics), dedup keeps max orderkey") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq((1L, 7L, ts("1995-01-01 00:00:00"))).toDF("event_id", "user_id", "ts")
    val orders = Seq(
      (100L, 7L, ts("1995-01-01 00:00:00"), 10.0),
      (101L, 7L, ts("1995-01-01 00:00:00"), 11.0) // same instant: 101 wins
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val r = AsofJoin.eventsToLatestOrder(events, orders).first()
    assert(r.getLong(3) == 101L)
  }

  test("resample+ffill: grid covers [floor(min), floor(max)], observation on a slot wins, gaps carry forward") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (1L, 7L, ts("2024-01-01 00:00:00"), 10.0), // exactly on slot 0
      (2L, 7L, ts("2024-01-01 00:30:00"), 20.0), // mid-slot
      (3L, 7L, ts("2024-01-01 03:10:00"), 30.0)  // 2-hour gap before this
    ).toDF("event_id", "user_id", "ts", "value")
    val r = Resample.ffill(events, 3600L).collect()
      .map(x => (x.getLong(1), x.getLong(2), x.getDouble(3)))
    val base = ts("2024-01-01 00:00:00").getTime / 1000
    assert(r.toSeq == Seq(
      (base, 1L, 10.0),              // slot 00: the on-slot observation wins
      (base + 3600, 2L, 20.0),       // slot 01: ffill from 00:30
      (base + 7200, 2L, 20.0),       // slot 02: gap carried forward
      (base + 10800, 2L, 20.0)))     // slot 03: 03:10 is AFTER the slot -> still 20
  }

  test("salted join result is identical to the plain join") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(o, Seq("l_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).as("q"))
      .orderBy("o_orderpriority").collect()
    val saltedJ = SkewJoin.salted(li, o, Seq("l_orderkey"), col("l_orderkey"), 8)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).as("q"))
      .orderBy("o_orderpriority").collect()
    assert(plain.toSeq == saltedJ.toSeq)
  }

  test("content-addressed split is stable under repartitioning and roughly proportioned") {
    val docs = Tables.documents(spark, sf).select("doc_id")
    val a = Splits.assign(docs, "doc_id").select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Splits.assign(docs.repartition(13), "doc_id").select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b, "split must not depend on partitioning")
    val frac = a.values.count(_ == "train").toDouble / a.size
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac should be ~0.8")
  }

  test("validation report flags planted violations") {
    import org.apache.spark.sql.functions._
    val bad = Seq((1L, "abc", "en", 3L), (2L, "abcd", "xx", 99L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val mism = bad.select(
      count(when(col("n_chars") =!= length(col("text")), 1)).as("m"),
      count(when(!col("lang").isin("en", "de", "fr", "es", "zh"), 1)).as("l")).first()
    assert(mism.getLong(0) == 1L && mism.getLong(1) == 1L)
    // fixture itself is clean: every rule reports zero
    val rep = Validate.report(spark, sf).collect()
    assert(rep.forall(_.getLong(1) == 0L),
      rep.map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(", "))
  }

  test("skewReport ranks hot keys with exact shares; bounded-heap selection plan") {
    import org.apache.spark.sql.functions._
    // key "hot" carries 12 of 18 rows; keys a..f one each
    val rows = (1 to 12).map(i => (i.toLong, "hot")) ++
      "abcdef".zipWithIndex.map { case (c, i) => ((100 + i).toLong, c.toString) }
    val df = rows.toDF("id", "k")
    val rep = Validate.skewReport(df, "k", topK = 3).collect()
    assert(rep.length == 3 && rep.head.getAs[String]("k") == "hot")
    assert(rep.head.getAs[Long]("n_rows_key") == 12L)
    assert(rep.head.getAs[Double]("share") == 12.0 / 18.0)
    // 7 keys, 18 rows, max 12 -> skew factor 12*7/18
    assert(rep.head.getAs[Double]("skew_factor") == 12.0 * 7.0 / 18.0)
    // ties below the hot key break by key ascending
    assert(rep.map(_.getAs[String]("k")).toList == List("hot", "a", "b"))
    val plan = Validate.skewReport(df, "k").queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "top-k must be a bounded heap, not a global sort: " + plan.take(500))
  }

  test("driftReport: identical snapshots are flat; one-sided keys report null terms") {
    import spark.implicits._
    val a = Seq((1L, "en"), (2L, "en"), (3L, "de"), (4L, "fr")).toDF("doc_id", "lang")
    val flat = Validate.driftReport(a, a, "lang").collect()
    flat.foreach { r =>
      assert(r.getAs[Double]("chi2_term") == 0.0)
      assert(r.getAs[Double]("share_old") == r.getAs[Double]("share_new"))
    }
    val b = Seq((1L, "en"), (2L, "es")).toDF("doc_id", "lang")
    val drift = Validate.driftReport(a, b, "lang")
      .collect().map(r => r.getAs[String]("lang") -> r).toMap
    assert(drift("es").isNullAt(drift("es").fieldIndex("share_old")))
    assert(drift("es").isNullAt(drift("es").fieldIndex("chi2_term")))
    assert(drift("de").getAs[Long]("n_new") == 0L)
    assert(drift("en").getAs[Double]("share_new") == 0.5)
  }

  test("GraftExtensions exposes the native expressions as SQL functions") {
    graft.GraftExtensions.registerAll(spark)
    val r = spark.sql(
      """SELECT cosine_similarity(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c,
        |       sorted_intersect_count(array('a','b'), array('b','c')) AS i,
        |       simhash32(array('x','y')) AS sh,
        |       rolling_hash32('ab') AS rh,
        |       nfc_normalize('cafe\u0301') AS nfc""".stripMargin).first()
    assert(r.getDouble(0) == 1.0)
    assert(r.getLong(1) == 1L)
    assert(r.getLong(3) == ('a'.toInt * 31 + 'b'.toInt).toLong)
    assert(r.getString(4) == "caf\u00e9")
  }
}
