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

  /** EXACTLY-ONCE append: each batch writes into its own
    * `__batch_id=<id>` partition directory plus a commit marker, and a
    * replay of an already-committed batch is a NO-OP — the idempotent-sink
    * contract every at-least-once orchestrator (retries, streaming
    * restarts, backfills) needs. The marker is written AFTER the data
    * commit: a crash between the two leaves an uncommitted directory that
    * the next attempt overwrites (never duplicates), because the batch
    * writes with Overwrite INTO ITS OWN partition path.
    *
    * Readers take only committed batches via [[readCommitted]] — an
    * uncommitted partial write is invisible. Returns true when this call
    * performed the write, false when the batch was already committed. */
  def appendIdempotent(df: DataFrame, path: String, batchId: Long): Boolean = {
    val dir = new org.apache.hadoop.fs.Path(s"$path/__batch_id=$batchId")
    val marker = new org.apache.hadoop.fs.Path(
      s"$path/_committed_batch_$batchId")
    val fs = dir.getFileSystem(
      df.sparkSession.sessionState.newHadoopConf())
    if (fs.exists(marker)) false
    else {
      df.write.mode(SaveMode.Overwrite).parquet(dir.toString)
      fs.create(marker, true).close()
      true
    }
  }

  /** Committed-batches view over an [[appendIdempotent]] destination. */
  def readCommitted(spark: SparkSession, path: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val committed =
      if (!fs.exists(root)) Seq.empty[String]
      else fs.listStatus(root).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("_committed_batch_"))
        .map(_.stripPrefix("_committed_batch_"))
    if (committed.isEmpty)
      spark.emptyDataFrame
    else
      spark.read.parquet(
        committed.map(b => s"$path/__batch_id=$b"): _*)
  }
}
