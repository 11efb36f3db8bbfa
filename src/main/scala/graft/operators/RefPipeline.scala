package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.GraftConfig
import graft.sinks.AppendSink
import graft.sources.Tables

/** The reference's ENTIRE pipeline (`HanaToBQ.main`, `HanaToBQ.java:227-261`)
  * composed from graft operators — the capstone parity query:
  *
  *   1. schema discovery            -> parquet/JDBC schema (authoritative)
  *   2. chunk planning              -> Chunking.boundariesDistributed + intervals
  *   3. parallel partitioned scan   -> union of half-open chunk range filters
  *      (parquet stand-in; JdbcPartitionedSource.read takes the same plan)
  *   4. stringify projection        -> RowOps.stringifyAll
  *   5. null-literal drop           -> RowOps.dropNullLiterals
  *   6. append sink, create-if-needed -> AppendSink, then read back
  *
  * Because the chunk intervals partition [start, sentinel) exactly (property-
  * tested), the unioned per-chunk scans return precisely the rows with
  * ts > startTime — which is what the oracle asserts, proving the plan's
  * coverage end-to-end rather than assuming it.
  */
object RefPipeline {

  def run(spark: SparkSession, dir: String, cfg: GraftConfig,
          sinkPath: String): DataFrame = {
    val src = Tables.lineitem(spark, dir)
      .withColumn(cfg.timestampColumn,
        col("l_shipdate").cast("timestamp").cast("long"))

    // 2. chunk plan (distributed form; parity form is plan-identical).
    // chunkSize is scaled to the table so the branch count stays bounded —
    // the reference's 1M-row default serves the same purpose: chunks are a
    // parallelism unit, not a fixed row quota. Without row-group ordering on
    // ts, every union branch re-scans the file, so branch count is a real cost.
    val n = src.count()
    val sized = cfg.copy(chunkSize = math.max(1L, n / 15))
    val intervals = Chunking.plan(src, sized, Seq("l_orderkey", "l_linenumber"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))

    // 3. one scan branch per chunk — the reference's chunk-per-worker model;
    //    each branch's range predicate pushes into the parquet scan
    val chunked = intervals.map { case (lo, hi) =>
      RowOps.rangeHalfOpen(src, cfg.timestampColumn, lit(lo), lit(hi))
        // seed interval starts AT startTime; ref's scan filter is ts > start
        .filter(col(cfg.timestampColumn) > cfg.startTime)
    }.reduce(_ unionAll _)

    // 4+5. projection stage (whole-stage codegen'd, no per-row Java loop)
    val projected = RowOps.dropNullLiterals(
      RowOps.stringifyAll(chunked.select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus",
        cfg.timestampColumn)),
      Seq("l_returnflag", "l_linestatus"))

    // 6. append + create-if-needed, then read back (sink round-trip)
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(sinkPath), true)
    AppendSink.appendParquet(projected, sinkPath)
    // (l_orderkey, l_linenumber) is NOT unique in the fixture — the ORDER BY
    // must be total over all output columns for a deterministic dump
    AppendSink.readBack(spark, sinkPath)
      .orderBy(col("l_orderkey").cast("long"), col("l_linenumber").cast("long"),
        col("l_returnflag"), col("l_linestatus"),
        col(cfg.timestampColumn).cast("long"))
  }
}
