package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.GraftConfig

/** Equi-depth chunk planning — the reference's most sophisticated computation
  * (SURVEY.md §2.3): the chunk-boundary window query (`HanaToBQ.java:57`)
  *
  * {{{
  * SELECT t.TS FROM
  *   (SELECT TS, ROW_NUMBER() OVER (ORDER BY TS) AS rownum
  *    FROM TBL WHERE TS > :start) AS t
  * WHERE MOD(rownum, :chunkSize) = 0 AND t.TS > :start
  * ORDER BY t.TS
  * }}}
  *
  * plus the driver-side interval zip with start seed and sentinel close
  * (`HanaToBQ.java:150-172`, sentinel `2000000000` at `:166`).
  *
  * Two implementations:
  *   - [[boundaries]]: literal parity — one global unpartitioned window.
  *     Exactly the reference's semantics AND its scalability hazard (the
  *     whole filtered table funnels through one task). Kept for parity tests.
  *   - [[boundariesDistributed]]: the 100 TB formulation. Range-repartition on
  *     the (totally ordered) sort key, compute per-partition row counts once
  *     (a tiny O(#partitions) aggregate), broadcast the cumulative offsets
  *     back, and derive the global row number as partition-local row_number +
  *     offset. No single-task funnel; shuffle is one range exchange, identical
  *     to what a global sort would need anyway. With a total order (tie-broken
  *     by unique keys) the output is bit-identical to [[boundaries]] no matter
  *     where the range partitioner cuts.
  */
object Chunking {

  /** Ordered projection of the timestamp column with a deterministic global
    * row number, parity version (single-partition window — the plan Spark
    * itself warns about, matching the reference's own funnel). */
  def boundaries(df: DataFrame, ts: String, tieBreak: Seq[String],
                 chunkSize: Long, start: Long): DataFrame = {
    val ord: Seq[Column] = col(ts) +: tieBreak.map(col)
    val w = Window.orderBy(ord: _*)
    df.filter(col(ts) > lit(start))
      .withColumn("rownum", row_number().over(w).cast("long"))
      .filter(col("rownum") % lit(chunkSize) === 0 && col(ts) > lit(start))
      .select(col(ts))
      .orderBy(col(ts) +: tieBreak.map(col): _*)
  }

  /** Scale-path equivalent of [[boundaries]]: distributed global row_number
    * via range partitioning + per-partition offsets. Output is identical
    * given a total order (ts + unique tiebreak). */
  def boundariesDistributed(df: DataFrame, ts: String, tieBreak: Seq[String],
                            chunkSize: Long, start: Long,
                            numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val ord: Seq[Column] = (col(ts) +: tieBreak.map(col)).map(_.asc)
    val n = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions

    val filtered = df.filter(col(ts) > lit(start))
    val ranged = filtered
      .repartitionByRange(n, ord: _*)
      .sortWithinPartitions(ord: _*)
      .withColumn("__pid", spark_partition_id())

    // Tiny metadata aggregate: #rows per range partition -> cumulative offset.
    // O(#partitions) rows on the driver — the same cardinality the reference
    // materializes for its boundary list, and broadcast-joined back.
    val counts = ranged.groupBy("__pid").count()
    val wOff = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__offset", coalesce(sum("count").over(wOff), lit(0L)))
      .select("__pid", "__offset")

    val wLocal = Window.partitionBy(col("__pid")).orderBy(ord: _*)
    ranged
      .withColumn("__local_rn", row_number().over(wLocal).cast("long"))
      .join(broadcast(offsets), "__pid")
      .withColumn("rownum", col("__local_rn") + col("__offset"))
      .filter(col("rownum") % lit(chunkSize) === 0)
      .select(col(ts))
      .orderBy(col(ts) +: tieBreak.map(col): _*)
  }

  /** Interval zip (`agg_interval_zip`, SURVEY.md §2.3): consecutive boundary
    * values become half-open `[lo, hi)` chunk intervals, seeded with `start`
    * and closed with the sentinel — the reference's driver-side loop
    * (`HanaToBQ.java:161-166`) re-expressed as a `lead` window so it never
    * leaves the cluster. Boundary cardinality is ~rowcount/chunkSize, so the
    * window's single partition holds only the (small) boundary set.
    */
  def intervals(bounds: DataFrame, ts: String, start: Long,
                sentinel: Long = GraftConfig.Sentinel): DataFrame = {
    val spark = bounds.sparkSession
    import spark.implicits._
    val seeded = bounds.select(col(ts).cast("long").as("b"))
      .unionAll(Seq(start).toDF("b"))
    val w = Window.orderBy(col("b"))
    seeded
      .withColumn("chunk_id", (row_number().over(w) - 1).cast("long"))
      .withColumn("lo", col("b"))
      .withColumn("hi", lead(col("b"), 1, sentinel).over(w))
      .select("chunk_id", "lo", "hi")
      .orderBy("chunk_id")
  }

  /** Distributed form of [[intervals]] — no single-partition window anywhere.
    * At the default 1M chunkSize the boundary set is tiny, but SCALE.md's
    * own arithmetic (100 TB / 1 KB rows, small chunks) puts it at ~10^8 rows,
    * where one global `Window.orderBy` funnels everything through one task.
    * Same offsets trick as [[boundariesDistributed]]: range-partition the
    * seeded boundary set, derive the global position from partition-local
    * row_number + broadcast cumulative counts, and resolve each boundary's
    * successor (`lead`) with a self-join on the derived position — every
    * exchange is range- or hash-partitioned on boundary cardinality. Output
    * is bit-identical to [[intervals]] (property-tested; same oracle). */
  def intervalsDistributed(bounds: DataFrame, ts: String, start: Long,
                           sentinel: Long = GraftConfig.Sentinel,
                           numPartitions: Int = 0): DataFrame = {
    val spark = bounds.sparkSession
    import spark.implicits._
    val n = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    val seeded = bounds.select(col(ts).cast("long").as("b"))
      .unionAll(Seq(start).toDF("b"))
    val ranged = seeded
      .repartitionByRange(n, col("b").asc)
      .sortWithinPartitions(col("b").asc)
      .withColumn("__pid", spark_partition_id())
    val counts = ranged.groupBy("__pid").count()
    val wOff = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__offset", coalesce(sum("count").over(wOff), lit(0L)))
      .select("__pid", "__offset")
    val wLocal = Window.partitionBy(col("__pid")).orderBy(col("b").asc)
    val numbered = ranged
      .withColumn("__local_rn", row_number().over(wLocal).cast("long"))
      .join(broadcast(offsets), "__pid")
      .select((col("__local_rn") + col("__offset") - 1).as("chunk_id"),
        col("b").as("lo"))
    // distributed lead(1): boundary at position i+1 is interval i's hi
    val next = numbered
      .select((col("chunk_id") - 1).as("chunk_id"), col("lo").as("hi"))
    numbered.join(next, Seq("chunk_id"), "left")
      .select(col("chunk_id"), col("lo"),
        coalesce(col("hi"), lit(sentinel)).as("hi"))
      .orderBy("chunk_id")
  }

  /** Interval zip that picks its physical form by boundary CARDINALITY:
    * below `smallThreshold` the parity form ([[intervals]]) — one window
    * over a provably tiny set, no exchanges worth scheduling; above it the
    * distributed offsets form ([[intervalsDistributed]]), whose fixed
    * multi-exchange overhead only pays for itself when the boundary set is
    * too big for one task (~10^8 boundaries at 100 TB with small chunks).
    * Both forms are bit-identical (property-tested), so the switch is pure
    * physical planning. The boundary frame is materialized once
    * (localCheckpoint) — counted, then zipped, never recomputed. */
  def intervalsAdaptive(bounds: DataFrame, ts: String, start: Long,
                        sentinel: Long = GraftConfig.Sentinel,
                        smallThreshold: Long = 100000L): DataFrame = {
    val b = bounds.localCheckpoint()
    if (b.count() <= smallThreshold) intervals(b, ts, start, sentinel)
    else intervalsDistributed(b, ts, start, sentinel)
  }

  /** End-to-end chunk plan from a config, over an epoch-seconds column.
    * Boundary computation always takes the distributed row-number form (the
    * input table is the 100 TB side); the interval zip adapts to the
    * boundary count ([[intervalsAdaptive]] — the boundary set is usually
    * rowcount/chunkSize, tiny, but must survive small chunkSize at scale). */
  def plan(df: DataFrame, cfg: GraftConfig, tieBreak: Seq[String]): DataFrame = {
    val b = boundariesDistributed(df, cfg.timestampColumn, tieBreak,
      cfg.chunkSize, cfg.startTime)
    intervalsAdaptive(b, cfg.timestampColumn, cfg.startTime, cfg.effectiveEnd)
  }

  /** Chunk intervals -> JDBC partition predicates, the exact fan-out shape of
    * the reference's chunk strings (`"lo,hi"` at `HanaToBQ.java:162`, bound as
    * `ts >= ? AND ts < ?` at `HanaToDBRow.java:103-111`). Feed to
    * `spark.read.jdbc(url, table, predicates, props)` — one Spark partition
    * per predicate, the reference's chunk-per-worker model. */
  def toPredicates(intervals: Seq[(Long, Long)], ts: String): Array[String] =
    intervals.map { case (lo, hi) => s"$ts >= $lo AND $ts < $hi" }.toArray

  /** DRIVER-FACING scan plan with a bounded footprint: the full chunk grid
    * ([[plan]] — boundaries and interval zip both distributed), coalesced
    * distributedly into at most `maxScanPartitions` CONTIGUOUS half-open
    * intervals (groups of `ceil(#chunks / cap)` consecutive chunks; min lo /
    * max hi per group — coverage and disjointness are inherited from the
    * grid), and only THAT list collected.
    *
    * This is the piece the JDBC scan API forces onto the driver — per-
    * partition predicates are plan-time strings — and the reference holds
    * the same list on ITS driver (`HanaToBQ.java:150-172`), unbounded: at
    * 100 TB with small chunks the grid is ~10^8 intervals, an OOM as a
    * driver list and useless as a scan fan-out (no DB serves 10^8
    * concurrent range queries). Capping keeps the driver list O(cap) at any
    * corpus size; scanned ROWS are identical (the union of the coalesced
    * intervals is the union of the grid), and the full-grain grid remains
    * available distributed ([[plan]]) for consumers that want chunk ids. */
  def boundedScanIntervals(df: DataFrame, cfg: GraftConfig,
                           tieBreak: Seq[String],
                           maxScanPartitions: Int = 512): Seq[(Long, Long)] = {
    require(maxScanPartitions > 0, "maxScanPartitions must be positive")
    // checkpoint: the grid feeds a count and a group-by — one computation
    val grid = plan(df, cfg, tieBreak).select("chunk_id", "lo", "hi")
      .localCheckpoint()
    val nChunks = grid.count()
    val stride = math.max(1L,
      (nChunks + maxScanPartitions - 1) / maxScanPartitions.toLong)
    grid
      .groupBy(expr(s"chunk_id DIV $stride").as("__g"))
      .agg(min("lo").as("lo"), max("hi").as("hi"))
      .orderBy("lo")
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi"))).toSeq
  }
}
