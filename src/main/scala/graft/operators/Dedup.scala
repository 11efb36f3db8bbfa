package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-data curation (north star scope).
  *
  * Exact lanes here; near-dup lanes (MinHash/LSH, SimHash, n-gram Jaccard,
  * embedding cosine) live in [[NearDup]].
  *
  * Scale notes: exact dedup is one shuffle on the dedup key — the canonical
  * hash-groupBy. `keepFirst` uses a partitioned window (no global funnel);
  * at 100 TB the key-hash shuffle is unavoidable and AQE handles skewed keys.
  */
object Dedup {

  /** Exact dedup on arbitrary keys, keeping the first row per key under a
    * deterministic order — `row_number` over a partitioned window, the
    * deterministic form of `dropDuplicates` (which keeps an arbitrary row). */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact text dedup over documents: group on the normalized-text md5,
    * keep the smallest doc_id as the survivor, count members. */
  def exactText(docs: DataFrame): DataFrame = {
    val norm = trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))
    docs.select(col("doc_id"), md5(norm).as("fp"))
      .groupBy("fp")
      .agg(min("doc_id").as("survivor_id"), count(lit(1)).as("n_members"))
      .orderBy("survivor_id")
  }

  /** Exact event dedup on (user_id, event_type), keeping the earliest event —
    * realistic at-least-once-delivery cleanup. */
  def eventsKeepEarliest(events: DataFrame): DataFrame =
    keepFirst(events, Seq("user_id", "event_type"),
      Seq(col("ts").asc, col("event_id").asc))
      .select("event_id", "user_id", "event_type")
      .orderBy("event_id")
}
