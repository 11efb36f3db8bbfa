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

  /** The write disposition the reference pins at `HanaToBQ.java:258-259`:
    * append to the destination, creating it if needed. These are the exact
    * option names the public spark-bigquery connector consumes, assembled
    * here so a connected environment flips ONLY `format` — the option
    * assembly is unit-testable without a live BigQuery. */
  def bigQuerySpec(dest: String,
                   extra: Map[String, String] = Map.empty): Map[String, String] =
    Map(
      "table" -> dest,
      "writeDisposition" -> "WRITE_APPEND",      // HanaToBQ.java:258
      "createDisposition" -> "CREATE_IF_NEEDED"  // HanaToBQ.java:259
    ) ++ extra

  /** Config-dispatched append: `parquet` (offline stand-in), `table`
    * (metastore `saveAsTable`), or `bigquery` (the connected path — requires
    * the spark-bigquery connector on the classpath; the sandbox exercises
    * only the option assembly above). */
  def append(df: DataFrame, dest: String, format: String = "parquet",
             options: Map[String, String] = Map.empty): Unit = format match {
    case "parquet" =>
      df.write.mode(SaveMode.Append).options(options).parquet(dest)
    case "table" =>
      df.write.mode(SaveMode.Append).options(options).saveAsTable(dest)
    case "bigquery" =>
      df.write.format("bigquery").mode(SaveMode.Append)
        .options(bigQuerySpec(dest, options)).save()
    case other =>
      throw new IllegalArgumentException(
        s"Unknown sink format '$other' (expected parquet | table | bigquery)")
  }

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
