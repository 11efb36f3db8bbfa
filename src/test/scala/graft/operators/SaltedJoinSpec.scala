package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def li = Tables.lineitem(spark, sf)
  private def ords = Tables.orders(spark, sf)
    .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))

  test("salted join output equals the plain join on fixture data") {
    val plain = li.join(ords, "l_orderkey")
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val salted = SaltedJoin.salted(li, ords, Seq("l_orderkey"),
        saltBy = Seq("l_orderkey", "l_linenumber"), salts = 8)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("salts = 1 degenerates to the plain join exactly") {
    val plain = li.join(ords, "l_orderkey").count()
    val one = SaltedJoin.salted(li, ords, Seq("l_orderkey"),
      saltBy = Seq("l_orderkey", "l_linenumber"), salts = 1).count()
    assert(one == plain)
  }

  test("planted 100x-hot key: salted join equals plain join bit-for-bit") {
    // 20% of 200k rows collapse onto key 0; the other 160k spread over
    // 1000 keys (~160 rows each) — the hot key is ~250x an average key
    val big = spark.range(0, 200000L).select(
      when(pmod(col("id"), lit(100L)) < 20, lit(0L))
        .otherwise(pmod(col("id"), lit(1000L)) + 1L).as("k"),
      col("id").as("row_id"),
      (col("id") % 7).cast("double").as("v"))
    val small = spark.range(0, 1001L).select(col("id").as("k"),
      (col("id") % 13).cast("double").as("w"))
    def summarize(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)), sum(col("v") * col("w"))).head()
    val plain = summarize(big.join(small, "k"))
    val salted = summarize(SaltedJoin.salted(big, small, Seq("k"),
      saltBy = Seq("k", "row_id"), salts = 32))
    assert(salted == plain)
  }

  test("a hot key's rows spread across salt buckets; duplicates on the replicated side survive") {
    // one key, 1000 big rows, 2 replicated rows -> 2000 joined rows, and the
    // big side's salts must hit many distinct buckets (content-addressed)
    val big = (1L to 1000L).map(i => (42L, i)).toDF("k", "row_id")
    val small = Seq((42L, "x"), (42L, "y")).toDF("k", "tag")
    val joined = SaltedJoin.salted(big, small, Seq("k"),
      saltBy = Seq("k", "row_id"), salts = 8)
    assert(joined.count() == 2000L)
    val buckets = big.select(
      pmod(xxhash64(col("k"), col("row_id")), lit(8L)).as("s"))
      .distinct().count()
    assert(buckets == 8L, "1000 rows should occupy all 8 salt buckets")
  }
}
