package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Line-oriented text sources (JSON-lines, CSV) with the schema discipline
  * a 100 TB ingest needs. The reference's source matrix is JDBC + an
  * in-memory collection (HanaToDBRow.java:83-86, HanaToBQ.java); a Spark
  * engine additionally meets exported feeds as JSONL/CSV, so the lane is
  * covered here with the same contract as the parquet tables.
  *
  * Scale rules encoded by this API, not left to the caller:
  *  - An EXPLICIT schema is required. Schema inference is a full extra
  *    pass over the data before the real one — at 100 TB that is the
  *    difference between one scan and two — and inferred types drift with
  *    the sample (a column of "01" infers integer one day, string the
  *    next), silently changing downstream semantics. The reference pins
  *    its schema the same way (catalog introspection, never sniffing).
  *  - `FAILFAST` parse mode. The default PERMISSIVE mode nulls malformed
  *    rows and keeps going; on a petabyte feed that is silent data loss
  *    discovered weeks later. Failing the task surfaces the bad shard
  *    immediately (the `badRecordsPath`-style triage can be layered on
  *    where partial progress is preferred — deliberately not the default).
  *  - Single-line records only (no `multiLine`): newline-delimited files
  *    split at arbitrary byte offsets, so a 1 TB file still fans out over
  *    every executor; multiLine JSON/CSV forces one task per FILE and is
  *    the classic accidental single-reader. Writers that embed newlines
  *    must escape them (JSON does by construction).
  *
  * Both readers preserve column pruning (`ReadSchema` in the scan shows
  * only selected fields — spec-asserted), so a 2-column projection over a
  * wide feed parses 2 fields per line, not all of them. */
object TextSources {

  /** Newline-delimited JSON with explicit schema, fail-fast parsing. */
  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "FAILFAST")
      .json(path)

  /** Header CSV with explicit schema, fail-fast parsing. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("mode", "FAILFAST")
      .csv(path)
}
