package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Offline table loaders over the driver-provided parquet fixtures
  * (TESTDATA.md). The parquet scan is the stand-in for the reference's
  * JDBC source scan (SURVEY.md §2.1 `src_jdbc_partitioned`): columnar,
  * predicate-pushdown- and column-pruning-capable by construction.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "region")
  /** events.parquet stores TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects. Read nanos as long (legacy conf), then normalize to
    * TIMESTAMP_NTZ at microsecond precision — the same nanos->micros
    * truncation DuckDB applies, so both engines see identical values. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, sfDir, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000"))
          .cast("timestamp_ntz"))
    else raw
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** `src_inline_collection` (SURVEY.md §2.1): materialize a driver-side
    * list as a distributed dataset — the Spark form of
    * `Create.of(list)` (`HanaToBQ.java:242,247`). */
  def inline(spark: SparkSession, values: Seq[String]): DataFrame = {
    import spark.implicits._
    values.toDF("value")
  }
}
