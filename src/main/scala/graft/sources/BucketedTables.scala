package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table layout for exchange-free fact-fact joins — the storage
  * lever that turns the biggest shuffle in a warehouse (fact ⋈ fact on the
  * shared key) into a local zipper. Writing both tables bucketed by the
  * join key with the SAME bucket count pins each key to the same bucket id
  * on both sides (Spark's bucket id is the Murmur3 hash-partitioning
  * function, so co-bucketed == co-partitioned); the scan then reports
  * `HashPartitioning(key, n)` and sort-merge join runs WITHOUT an Exchange
  * on either side (spec-asserted). At 100 TB this is the difference
  * between re-shuffling both tables on every join and paying the shuffle
  * ONCE at write time, amortized over every downstream join/aggregate on
  * that key.
  *
  * Reference scope: the reference materializes its scan into a staging
  * table keyed by chunk (`HanaToDBRow.java:80-112` plans per-chunk reads);
  * bucketing is the lake-native form of that key-aligned layout.
  */
object BucketedTables {

  /** Write `df` as an external bucketed table (one file per bucket: the
    * pre-write `repartition(buckets, key)` uses the same Murmur3-pmod
    * function as the bucket-id assignment, so every task holds exactly one
    * bucket). `sortBy` persists the in-bucket order for zipper-friendly
    * merge reads. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    buckets: Int, key: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.repartition(buckets, col(key))
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  private def tag(sfDir: String): String =
    sfDir.replaceAll("[^A-Za-z0-9]", "_").replaceAll("_+", "_")
      .stripPrefix("_").stripSuffix("_")

  /** Evidence query: orders and lineitem co-bucketed by order key, joined
    * and rolled up per order priority. The oracle aggregates the ORIGINAL
    * parquet — value equality across the bucketed write/read hop plus the
    * co-located join is the check; the no-Exchange plan shape is asserted
    * in `BucketedJoinSpec`. All measures are exact (counts + decimal
    * sums, one final double cast each). */
  def colocatedJoinAgg(spark: SparkSession, sfDir: String,
                       buckets: Int = 8): DataFrame = {
    // namespace paths AND table names by the Spark application id: the
    // write is a query side effect, and two concurrent sessions over the
    // same sfDir would otherwise race on the files and metastore entries
    val t = tag(sfDir) + "_" + tag(spark.sparkContext.applicationId)
    val oTable = s"graft_bkt_orders_$t"
    val lTable = s"graft_bkt_lineitem_$t"
    val base = s"/tmp/graft_bucketed/$t"
    // The two bucketed writes are independent jobs of `buckets` tasks each;
    // run them from driver threads so the second write back-fills the
    // first's task tail instead of queueing behind it (guide §2.6 — round-14
    // ProbeR14: sequential 1.03 s, overlapped 0.70 s at sf0.1/local[32],
    // result-identical by construction since each write is unchanged).
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val fo = scala.concurrent.Future(writeBucketed(
      Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_orderpriority"),
      oTable, s"$base/orders", buckets, "o_orderkey"))
    val fl = scala.concurrent.Future(writeBucketed(
      Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_quantity", "l_extendedprice", "l_discount"),
      lTable, s"$base/lineitem", buckets, "l_orderkey"))
    try {
      scala.concurrent.Await.result(fo, scala.concurrent.duration.Duration.Inf)
      scala.concurrent.Await.result(fl, scala.concurrent.duration.Duration.Inf)
    } finally pool.shutdown()
    val o = spark.table(oTable)
    val l = spark.table(lTable)
    o.join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        countDistinct(col("o_orderkey")).as("n_orders"),
        count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"),
        // re-round the sum to scale 4 before the double cast: DuckDB's
        // decimal(38,10)->double cast double-rounds past 2^53
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(28,10)")).cast("decimal(28,4)").cast("double")
          .as("revenue"))
      .orderBy("o_orderpriority")
  }
}
