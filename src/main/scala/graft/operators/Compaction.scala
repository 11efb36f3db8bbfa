package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planner — the OPTIMIZE-style table-maintenance step:
  * given per-file stats (file id, partition dir, bytes), bin-pack each
  * partition's files into target-size output groups and report the rewrite
  * plan (one row per output file: which inputs, how many bytes).
  *
  * Placement rule: files are taken in id order within their partition and a
  * file lands in the bin holding its FIRST byte — `bin = (running bytes
  * BEFORE the file) div target`, the [[Packing]] prefix-sum placement. This
  * is the deterministic streaming-greedy packing (first-fit in arrival
  * order), which is what table formats actually run: it never reorders
  * files, so the plan is stable under re-planning and independent of
  * partitioning.
  *
  * Scale shape: ONE window keyed by partition dir — compaction of separate
  * partitions is embarrassingly parallel (this is the real shape: small-file
  * pathology is per-partition). File-stat rows are metadata (bytes-sized),
  * never the data itself; a single partition with millions of files would
  * use [[Packing.packCounts]]'s bucketed-offsets trick, same placement. */
object Compaction {

  /** Per-input-file placement: (part, file_id, bytes, byte_start, bin). */
  def assign(files: DataFrame, target: Long,
             part: String = "part", id: String = "file_id",
             bytes: String = "bytes"): DataFrame = {
    require(target > 0, "target must be positive")
    val w = Window.partitionBy(part).orderBy(id)
      .rowsBetween(Window.unboundedPreceding, -1)
    files.withColumn("byte_start",
        coalesce(sum(bytes).over(w), lit(0L)))
      .withColumn("bin", expr(s"byte_start div $target"))
      .select(col(part), col(id), col(bytes), col("byte_start"), col("bin"))
  }

  /** Incremental placement: new files continue each partition's packing
    * from where the existing files end — history is reduced to ONE running
    * total per partition dir (a broadcast-sized aggregate) and is never
    * re-windowed or re-shuffled (the frozen-quantizer ingest discipline:
    * history state, not history rows). When every new file id sorts after
    * the partition's existing ids, the result is bit-identical to
    * re-planning from scratch restricted to the new files — asserted in
    * `CompactionSpec` and by the `q_compaction_incr` oracle. */
  def assignIncremental(history: DataFrame, newFiles: DataFrame, target: Long,
                        part: String = "part", id: String = "file_id",
                        bytes: String = "bytes"): DataFrame =
    assignIncrementalFromTails(tailTotals(history, part, bytes),
      newFiles, target, part, id, bytes)

  /** The per-partition TAIL state [[assignIncremental]] consumes: one
    * running byte total per partition dir. A plain SUM — commutative and
    * mergeable — so a streaming aggregation maintains it online across any
    * trigger split (agreement spec-asserted in `StreamingOpsSpec` via
    * [[graft.streaming.StreamingOps.compactionTails]]); at rest it's a
    * broadcast-sized table, never history rows. */
  def tailTotals(files: DataFrame, part: String = "part",
                 bytes: String = "bytes"): DataFrame =
    files.groupBy(part).agg(sum(bytes).as("__hist"))

  /** [[assignIncremental]] against an already-maintained tail-state table
    * (the streaming-ingest form: state in, placement out — history rows
    * never rescanned). */
  def assignIncrementalFromTails(tails: DataFrame, newFiles: DataFrame,
                                 target: Long, part: String = "part",
                                 id: String = "file_id",
                                 bytes: String = "bytes"): DataFrame = {
    require(target > 0, "target must be positive")
    val w = Window.partitionBy(part).orderBy(id)
      .rowsBetween(Window.unboundedPreceding, -1)
    newFiles
      .join(broadcast(tails.select(col(part), col("__hist"))), Seq(part), "left")
      .withColumn("byte_start",
        coalesce(col("__hist"), lit(0L)) +
          coalesce(sum(bytes).over(w), lit(0L)))
      .withColumn("bin", expr(s"byte_start div $target"))
      .select(col(part), col(id), col(bytes), col("byte_start"), col("bin"))
  }

  /** The rewrite plan: one row per planned output file. `undersized` marks
    * bins still below target (the partition's tail — only the last bin per
    * partition can be undersized, which the spec asserts). */
  def plan(files: DataFrame, target: Long,
           part: String = "part", id: String = "file_id",
           bytes: String = "bytes"): DataFrame =
    assign(files, target, part, id, bytes)
      .groupBy(col(part), col("bin"))
      .agg(count(lit(1)).as("n_files"),
        sum(bytes).as("bytes_total"),
        min(id).as("first_file"),
        max(id).as("last_file"))
      .withColumn("undersized", col("bytes_total") < target)
      .orderBy(part, "bin")
}
