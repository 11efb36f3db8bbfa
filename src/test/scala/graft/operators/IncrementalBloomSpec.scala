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
