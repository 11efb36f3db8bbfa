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
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
