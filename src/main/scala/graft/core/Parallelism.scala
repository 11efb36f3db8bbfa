package graft.core

import org.apache.spark.sql.DataFrame

/** Partitioning for compute-bound narrow maps.
  *
  * Spark sizes scan partitions by input BYTES (`files.maxPartitionBytes`),
  * which is right for IO-bound work and wrong for compute-bound per-row work:
  * a 2 MB parquet of 5k documents arrives as ONE split, serializing millions
  * of per-row hash/sketch operations onto a single core. Repartitioning to
  * the cluster's parallelism costs one tiny shuffle and unlocks every core —
  * at 100 TB the same rule holds whenever bytes-per-row is small relative to
  * compute-per-row (sketching, hashing, decoding). */
object Parallelism {
  def forCompute(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    // IDEMPOTENT: operators apply forCompute defensively at their entry
    // points, and callers often hand in an already-repartitioned (and
    // persisted) frame — wrapping again would stack a second full shuffle
    // per action AND miss the caller's cache (the CacheManager matches the
    // inner subtree only). A frame whose top node is already a shuffling
    // repartition needs nothing more.
    val already = df.queryExecution.logical match {
      case r: org.apache.spark.sql.catalyst.plans.logical.Repartition =>
        r.shuffle
      case _: org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression =>
        true
      case _ => false
    }
    if (already) return df
    // estimate the scan's split count from optimizer statistics — NOT from
    // df.rdd.getNumPartitions, which forces eager physical planning of the
    // whole upstream subtree on every call. sizeInBytes is the file size for
    // parquet scans (accurate); unknown-stat plans estimate large and skip
    // the repartition, which only forgoes an optimization.
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val maxSplit = BigInt(spark.sessionState.conf.filesMaxPartitionBytes)
    val estSplits = bytes / maxSplit + 1
    if (estSplits >= target) df else df.repartition(target)
  }
}
