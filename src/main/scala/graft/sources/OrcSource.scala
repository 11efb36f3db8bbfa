package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** ORC columnar source/sink — the second columnar format a warehouse
  * migration actually meets (Hive-era estates are ORC; the reference's
  * BigQuery target speaks columnar on both sides). Same 100 TB schema
  * discipline as [[TextSources]]: explicit schema (no inference pass) and
  * the format's native predicate pushdown + column pruning left intact —
  * the ORC scan must show PushedFilters/ReadSchema exactly like parquet
  * (spec-asserted), because a format swap that silently drops pushdown
  * turns a 2-column month scan into a full-table read. */
object OrcSource {

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Explicit-schema ORC read; schema-on-read mismatches fail the scan,
    * not null out columns. */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Roundtrip evidence query: lineitem columns (flag, decimal measures,
    * NTZ timestamp, key) through ORC bytes and back, then a grouped
    * aggregate whose oracle runs on the ORIGINAL parquet — value equality
    * across the format hop is the check (decimal scale, timestamp
    * semantics, string enc). */
  def roundtripAgg(spark: SparkSession, dir: String): DataFrame = {
    val out = "/tmp/graft_orc_roundtrip"
    val cols = Seq("l_orderkey", "l_returnflag", "l_quantity",
      "l_extendedprice", "l_shipdate")
    val src = Tables.lineitem(spark, dir).select(cols.map(col): _*)
    FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new Path(out), true)
    writeOrc(src, out)
    val back = readOrc(spark, out, src.schema)
    back.groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"),
        max(col("l_shipdate").cast("timestamp").cast("long"))
          .as("max_ship_epoch"))
      .orderBy("l_returnflag")
  }
}
