package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for train/validation/test.
  *
  * RNG-based sampling (`df.sample`, `randomSplit`) is seed-and-partitioning
  * dependent — re-running on re-partitioned data reassigns rows. Production
  * pipelines split by CONTENT-ADDRESSED hash instead: a row's bucket is a pure
  * function of its key and a salt, so splits are stable across runs, engines,
  * partitionings, and incremental re-ingestion (a re-ingested document lands
  * in the same split it was in last month). Narrow map, zero shuffle. */
object Splits {

  /** Bucket in [0, 100) from md5(key || "|" || salt) — portable to any engine
    * with md5 (first 8 hex chars as an int, mod 100). */
  def bucket(key: Column, salt: String): Column =
    pmod(conv(substr(md5(concat(key.cast("string"), lit("|" + salt))),
      lit(1), lit(8)), 16, 10).cast("long"), lit(100L))

  /** Assign train/val/test by hash bucket: [0,80) / [80,90) / [90,100). */
  def assign(df: DataFrame, keyCol: String, salt: String = "graft_v1",
             trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val b = bucket(col(keyCol), salt)
    df.withColumn("bucket", b)
      .withColumn("split",
        when(b < trainPct, "train")
          .when(b < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Leakage-free split: near-duplicates must not straddle train/test, or
    * the eval set silently overlaps the training set. Every document is
    * bucketed by its duplicate-CLUSTER representative (the component's min
    * id from [[Dedup.dedupClusters]] over `pairs`), not by its own id —
    * all members of a near-dup cluster land in the same split; singletons
    * (no pair) represent themselves.
    *
    * Scale: the cluster table is id-pairs only (the pair detector already
    * exchanged nothing wider); the join back to `ids` is key-on-key; the
    * bucket itself is a narrow zero-shuffle map, same as [[assign]]. */
  def clusterAssign(ids: DataFrame, pairs: DataFrame, keyCol: String,
                    salt: String = "graft_v1",
                    trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val clustered = Dedup.dedupClusters(pairs)
      .withColumnRenamed("doc_id", keyCol)
    val withRep = ids.select(col(keyCol))
      .join(clustered, Seq(keyCol), "left")
      .withColumn("rep", coalesce(col("cluster_id"), col(keyCol)))
      .select(col(keyCol), col("rep"))
    val b = bucket(col("rep"), salt)
    withRep.withColumn("bucket", b)
      .withColumn("split",
        when(b < trainPct, "train")
          .when(b < trainPct + valPct, "val")
          .otherwise("test"))
  }
}
