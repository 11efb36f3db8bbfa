package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** `snk_bq_append` (SURVEY.md §2.1): append rows to a destination table,
  * creating it with the derived schema if absent — the reference's
  * `WRITE_APPEND` + `CREATE_IF_NEEDED` (`HanaToBQ.java:256-259`).
  *
  * In Spark these are exactly `SaveMode.Append` semantics: the file-commit
  * protocol (staging dir + atomic rename) mirrors the ref's GCS-staging-then-
  * load shape. Offline stand-in is parquet; in a connected environment the
  * same call with `format("bigquery")` is the real sink.
  */
object AppendSink {
  def appendParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  def appendTable(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Append).saveAsTable(table)

  def readBack(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Hive-style partitioned append — the 100 TB table layout: partition
    * columns become directories, so date/tenant predicates prune entire
    * partitions at planning time (verified by `PartitionedSinkSpec`: the scan
    * shows the predicate under PartitionFilters, not as a row filter). */
  def appendPartitioned(df: DataFrame, path: String,
                        partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Append).partitionBy(partitionCols: _*).parquet(path)
}
