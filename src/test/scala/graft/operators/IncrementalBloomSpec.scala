package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** Incremental history dedup + bloom-pruned join: result parity with the
  * naive forms, and the plan shapes that make them scale. */
class IncrementalBloomSpec extends SparkSpec {

  private val fp = md5(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")))

  test("newAgainstHistory equals the naive anti-join") {
    val docs = Tables.documents(spark, sf)
    val history = docs.filter(col("doc_id") <= 30).withColumn("fp", fp)
    val batch = docs.filter(col("doc_id") > 25).withColumn("fp", fp)
    val fast = Dedup.newAgainstHistory(batch, history, "fp").select("doc_id")
    val naive = batch.join(history.select("fp"), Seq("fp"), "left_anti")
      .select("doc_id")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
    // overlap rows (26..30) must actually drop
    assert(fast.filter(col("doc_id") <= 30).count() == 0)
    assert(fast.count() > 0)
  }

  test("newAgainstHistory plan: history feeds broadcast joins, never a sort-merge exchange") {
    val docs = Tables.documents(spark, sf)
    val history = docs.filter(col("doc_id") <= 30).withColumn("fp", fp)
    val batch = docs.filter(col("doc_id") > 25).withColumn("fp", fp)
    val p = Dedup.newAgainstHistory(batch, history, "fp")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi")
      && p.contains("LeftAnti"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("bloom-pruned join equals the plain join") {
    val li = Tables.lineitem(spark, sf)
    val ords = Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 300000)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    val fast = BloomJoin.pruned(li, ords, "l_orderkey")
      .select("l_orderkey", "l_linenumber", "o_orderstatus")
    val plain = li.join(ords, Seq("l_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_orderstatus")
    assert(fast.exceptAll(plain).isEmpty && plain.exceptAll(fast).isEmpty)
    assert(fast.count() > 0, "filter must keep some build rows for the test to bite")
  }

  test("bloom-pruned join plan: sketch + membership probe precede the join") {
    val li = Tables.lineitem(spark, sf)
    val ords = Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 300000)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    val p = BloomJoin.pruned(li, ords, "l_orderkey")
      .queryExecution.executedPlan.toString
    assert(p.contains("bloom_filter_agg"), p.take(3000))
    assert(p.contains("might_contain"), p.take(3000))
  }

  test("groupZScore: per-group z has mean~0 and std~1; constant group yields null z") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "n_chars")
    val z = Relational.groupZScore(docs, "lang", "n_chars")
    val perGroup = z.groupBy("lang")
      .agg(avg("z").as("m"), stddev_pop("z").as("sd"), count(lit(1)).as("n"))
      .collect()
    perGroup.filter(_.getAs[Long]("n") > 1).foreach { r =>
      assert(math.abs(r.getAs[Double]("m")) < 1e-9, r.toString)
      assert(math.abs(r.getAs[Double]("sd") - 1.0) < 1e-9, r.toString)
    }
    // zero-variance group: z must be null, not infinity
    val const = Seq((1L, "k", 5L), (2L, "k", 5L)).toDF("doc_id", "lang", "n_chars")
    val zc = Relational.groupZScore(const, "lang", "n_chars")
      .select("z").collect()
    assert(zc.forall(_.isNullAt(0)))
    // stats side broadcasts back over the row stream
    val p = z.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("histogram buckets are total: counts sum to the table size, lo/hi inside bucket bounds") {
    val h = Relational.priceHistogram(spark, sf).collect()
    val total = Tables.lineitem(spark, sf).count()
    assert(h.map(_.getAs[Long]("n")).sum == total)
    h.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val lo = r.getAs[Double]("lo")
      val hi = r.getAs[Double]("hi")
      assert(lo >= b * 5000.0 && hi < (b + 1) * 5000.0 && lo <= hi, r.toString)
    }
  }
}
