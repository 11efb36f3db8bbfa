package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GraftConfig, HanaTypes}
import graft.operators._
import graft.sinks.AppendSink
import graft.sources.Tables

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, with DuckDB oracle SQL where expressible.
  *
  * Determinism rules (SURVEY.md §5, FIXTURES.md): every query ends in an
  * ORDER BY whose suffix is a unique key; aggregates over doubles go through
  * DECIMAL casts (exact, order-insensitive) in BOTH engines; row_number-ish
  * outputs are cast to long to match DuckDB's BIGINT.
  */
object SparkEntry {

  /** epoch seconds of 1995-01-01T00:00:00Z — the `--startTime` stand-in. */
  val Start = 788918400L
  val ChunkSize = 500L

  private def cfg = GraftConfig(
    tableName = "lineitem", timestampColumn = "ts_epoch",
    startTime = Start, chunkSize = ChunkSize)

  /** lineitem with the numeric timestamp column the reference requires
    * (`README:31`): epoch seconds of l_shipdate. Fixture timestamps are
    * TIMESTAMP_NTZ; session TZ is pinned UTC, so NTZ->TIMESTAMP->long equals
    * DuckDB's epoch() of the naive value. */
  private def li(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .withColumn("ts_epoch", col("l_shipdate").cast("timestamp").cast("long"))

  private val tie = Seq("l_orderkey", "l_linenumber")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val d = li(spark, "/root/testdata/sf0.001")
    Chunking.intervals(
      Chunking.boundariesDistributed(d, "ts_epoch", tie, 100L, Start),
      "ts_epoch", Start)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.3 chunk planning (win_row_number + filt_mod + sort_global) ----
    "q_chunk_boundaries" -> ((s, dir) =>
      Chunking.boundaries(li(s, dir), "ts_epoch", tie, ChunkSize, Start)),
    "q_chunk_boundaries_dist" -> ((s, dir) =>
      Chunking.boundariesDistributed(li(s, dir), "ts_epoch", tie, ChunkSize, Start)),
    "q_chunk_intervals" -> ((s, dir) =>
      Chunking.intervals(
        Chunking.boundariesDistributed(li(s, dir), "ts_epoch", tie, ChunkSize, Start),
        "ts_epoch", Start)),

    // ---- §2.2 predicates / projections ----
    "q_range_halfopen" -> ((s, dir) =>
      RowOps.rangeHalfOpen(li(s, dir), "ts_epoch", lit(820454400L), lit(852076800L))
        .select(col("l_orderkey"), col("l_linenumber"), col("ts_epoch"))
        .orderBy("l_orderkey", "l_linenumber")),
    "q_pred_gt_proj" -> ((s, dir) =>
      RowOps.project(
        RowOps.greaterThan(li(s, dir), "ts_epoch", lit(Start)), Seq("ts_epoch"))
        .orderBy("ts_epoch")),
    "q_stringify" -> ((s, dir) =>
      RowOps.stringifyAll(
        li(s, dir).select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus"))
        .orderBy(col("l_orderkey").cast("long"), col("l_linenumber").cast("long"))),
    "q_null_literal" -> ((s, dir) =>
      RowOps.dropNullLiterals(
        Tables.documents(s, dir).select("doc_id", "source", "lang"), Seq("source", "lang"))
        .orderBy("doc_id")),
    "q_cast_type_map" -> ((s, dir) =>
      HanaTypes.castTo(
        Tables.lineitem(s, dir).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"),
        Seq("l_orderkey" -> "BIGINT", "l_linenumber" -> "INTEGER",
            "l_quantity" -> "DOUBLE", "l_returnflag" -> "NVARCHAR"))
        .orderBy("l_orderkey", "l_linenumber")),

    // ---- §2.1 sources / sinks ----
    "q_inline_chunks" -> ((s, _) =>
      Tables.inline(s, Seq(s"$Start,820454400", "820454400,852076800",
          s"852076800,${GraftConfig.Sentinel}"))
        .select(
          split(col("value"), ",").getItem(0).cast("long").as("lo"),
          split(col("value"), ",").getItem(1).cast("long").as("hi"))
        .orderBy("lo")),
    "q_append_sink" -> ((s, dir) => {
      val out = s"/tmp/graft_sink_roundtrip"
      val src = Tables.lineitem(s, dir).select("l_orderkey", "l_linenumber", "l_returnflag")
      org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(out), true)
      AppendSink.appendParquet(src, out)
      AppendSink.readBack(s, out).orderBy("l_orderkey", "l_linenumber")
    }),

    // ---- §2.4 equi-depth partition assignment (part_equidepth) ----
    "q_part_equidepth" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col("ts_epoch"), col("l_orderkey"), col("l_linenumber"))
      li(s, dir)
        .withColumn("bucket", ntile(8).over(w).cast("long"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_rows"),
             min("ts_epoch").as("lo"), max("ts_epoch").as("hi"))
        .orderBy("bucket")
    }),
  )

  def oracleSql: Map[String, String] = {
    val boundarySql =
      s"""SELECT ts_epoch FROM (
         |  SELECT CAST(floor(epoch(l_shipdate)) AS BIGINT) AS ts_epoch,
         |         row_number() OVER (ORDER BY CAST(floor(epoch(l_shipdate)) AS BIGINT), l_orderkey, l_linenumber) AS rownum
         |  FROM lineitem
         |  WHERE CAST(floor(epoch(l_shipdate)) AS BIGINT) > $Start
         |) t WHERE rownum % $ChunkSize = 0 AND ts_epoch > $Start
         |ORDER BY ts_epoch""".stripMargin
    Map(
      "q_chunk_boundaries" -> boundarySql,
      "q_chunk_boundaries_dist" -> boundarySql,
      "q_chunk_intervals" ->
        s"""WITH b AS ($boundarySql),
           |     seeded AS (SELECT ts_epoch AS b FROM b UNION ALL SELECT $Start)
           |SELECT CAST(row_number() OVER (ORDER BY b) - 1 AS BIGINT) AS chunk_id,
           |       b AS lo,
           |       CAST(lead(b, 1, ${GraftConfig.Sentinel}) OVER (ORDER BY b) AS BIGINT) AS hi
           |FROM seeded ORDER BY chunk_id""".stripMargin,
      "q_range_halfopen" ->
        """SELECT l_orderkey, l_linenumber, CAST(floor(epoch(l_shipdate)) AS BIGINT) AS ts_epoch
          |FROM lineitem
          |WHERE CAST(floor(epoch(l_shipdate)) AS BIGINT) >= 820454400
          |  AND CAST(floor(epoch(l_shipdate)) AS BIGINT) < 852076800
          |ORDER BY l_orderkey, l_linenumber""".stripMargin,
      "q_pred_gt_proj" ->
        s"""SELECT CAST(floor(epoch(l_shipdate)) AS BIGINT) AS ts_epoch
           |FROM lineitem WHERE CAST(floor(epoch(l_shipdate)) AS BIGINT) > $Start
           |ORDER BY ts_epoch""".stripMargin,
      "q_stringify" ->
        """SELECT CAST(l_orderkey AS VARCHAR) AS l_orderkey,
          |       CAST(l_linenumber AS VARCHAR) AS l_linenumber,
          |       CAST(l_returnflag AS VARCHAR) AS l_returnflag,
          |       CAST(l_linestatus AS VARCHAR) AS l_linestatus
          |FROM lineitem ORDER BY CAST(l_orderkey AS BIGINT), CAST(l_linenumber AS BIGINT)""".stripMargin,
      "q_null_literal" ->
        """SELECT doc_id,
          |       CASE WHEN lower(CAST(source AS VARCHAR)) = 'null' THEN NULL ELSE CAST(source AS VARCHAR) END AS source,
          |       CASE WHEN lower(CAST(lang AS VARCHAR)) = 'null' THEN NULL ELSE CAST(lang AS VARCHAR) END AS lang
          |FROM documents ORDER BY doc_id""".stripMargin,
      "q_cast_type_map" ->
        """SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
          |       CAST(l_linenumber AS BIGINT) AS l_linenumber,
          |       CAST(l_quantity AS DOUBLE) AS l_quantity,
          |       CAST(l_returnflag AS VARCHAR) AS l_returnflag
          |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
      "q_inline_chunks" ->
        s"""SELECT CAST(lo AS BIGINT) AS lo, CAST(hi AS BIGINT) AS hi
           |FROM (VALUES ($Start, 820454400), (820454400, 852076800),
           |             (852076800, ${GraftConfig.Sentinel})) t(lo, hi)
           |ORDER BY lo""".stripMargin,
      "q_append_sink" ->
        """SELECT l_orderkey, l_linenumber, l_returnflag
          |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
      "q_part_equidepth" ->
        """SELECT bucket, count(*) AS n_rows, min(ts_epoch) AS lo, max(ts_epoch) AS hi
          |FROM (
          |  SELECT CAST(floor(epoch(l_shipdate)) AS BIGINT) AS ts_epoch,
          |         CAST(ntile(8) OVER (ORDER BY CAST(floor(epoch(l_shipdate)) AS BIGINT), l_orderkey, l_linenumber) AS BIGINT) AS bucket
          |  FROM lineitem
          |) t GROUP BY bucket ORDER BY bucket""".stripMargin,
    )
  }
}
