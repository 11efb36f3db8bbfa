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
  def events(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "events")
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
