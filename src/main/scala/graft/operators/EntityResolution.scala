package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-pass blocking entity resolution — the data-integration twin of
  * document dedup: records that agree on ANY of several normalized block
  * keys (exact phone digits, exact name, ...) are candidate matches; the
  * transitive closure of all passes' matches is one ENTITY, with the
  * minimum record id as its canonical id.
  *
  * Scale notes (100 TB design):
  *   - each blocking pass emits STAR edges (block-min id → member id), not
  *     all intra-block pairs — a k-record block contributes k-1 edges
  *     instead of C(k,2), so a hot block (the empty-phone pathology)
  *     degrades linearly, not quadratically; the closure outcome is
  *     identical because a star spans exactly the same component;
  *   - edges carry two ids only; payload columns never shuffle;
  *   - the closure itself is [[Dedup.dedupClusters]]'s pointer-halving
  *     O(log diameter) loop, shared with the dedup family.
  */
object EntityResolution {

  /** Edges from one blocking pass: (min id in block, id) for every
    * multi-record block. Rows whose key is null never block. */
  private def starEdges(records: DataFrame, idCol: String, key: Column): DataFrame = {
    val w = Window.partitionBy("__key")
    records.select(col(idCol).as("b_id"), key.as("__key"))
      .filter(col("__key").isNotNull)
      .withColumn("a_id", min(col("b_id")).over(w))
      .filter(col("a_id") =!= col("b_id"))
      .select("a_id", "b_id")
  }

  /** Resolve entities over `records`: union every pass's star edges, close
    * transitively, canonicalize to the component-min id. Output one row
    * per input record: (record_id, entity_id, entity_size), where
    * singletons are their own entity of size 1. */
  def resolve(records: DataFrame, idCol: String, blockKeys: Seq[Column]): DataFrame = {
    require(blockKeys.nonEmpty, "at least one blocking key")
    val edges = blockKeys.map(k => starEdges(records, idCol, k))
      .reduce(_ unionAll _).distinct()
    val clustered = Dedup.dedupClusters(edges)
      .select(col("doc_id").as("record_id"), col("cluster_id"))
    val sized = Window.partitionBy("entity_id")
    records.select(col(idCol).as("record_id"))
      .join(clustered, Seq("record_id"), "left")
      .withColumn("entity_id", coalesce(col("cluster_id"), col("record_id")))
      .withColumn("entity_size", count(lit(1)).over(sized))
      .select("record_id", "entity_id", "entity_size")
  }

  /** Incremental resolution of a `batch` against FROZEN history — the daily
    * ingest form: history entities are never rewritten; the batch resolves
    * internally (same star-edge closure, batch-sized), each batch record
    * collects the history entities it block-matches, and every batch
    * component adopts the SMALLEST matched entity (or mints its component
    * min as a new entity if nothing matched; `is_new` reports which).
    * A batch that would bridge two history entities adopts the smaller
    * one and does NOT merge them — the standard incremental-ER contract
    * (merges are a compaction decision, not an ingest side effect).
    *
    * Scale: history participates ONLY as its (block key, id) projection
    * joined to the (small) batch key side, then a keyed hop to the
    * (id, entity) map — the history payload never reshuffles, and the
    * closure runs over batch edges alone. */
  def resolveIncremental(history: DataFrame, historyEntities: DataFrame,
                         batch: DataFrame, idCol: String,
                         blockKeys: Seq[Column]): DataFrame = {
    val batchLocal = resolve(batch, idCol, blockKeys)
      .select(col("record_id"), col("entity_id").as("__bent"))
    val histEnt = historyEntities
      .select(col("record_id").as("__h_id"), col("entity_id").as("__h_ent"))
    val adopted = blockKeys.map { k =>
      val bk = batch.select(col(idCol).as("record_id"), k.as("__key"))
        .filter(col("__key").isNotNull)
      val hk = history.select(col(idCol).as("__h_id"), k.as("__key"))
        .filter(col("__key").isNotNull)
      hk.join(broadcast(bk), "__key")
        .join(histEnt, "__h_id")
        .select(col("record_id"), col("__h_ent"))
    }.reduce(_ unionAll _)
      .groupBy("record_id").agg(min(col("__h_ent")).as("adopt"))
    val wComp = Window.partitionBy("__bent")
    batchLocal
      .join(adopted, Seq("record_id"), "left")
      .withColumn("__centity", min(col("adopt")).over(wComp))
      .withColumn("entity_id", coalesce(col("__centity"), col("__bent")))
      .withColumn("is_new", col("__centity").isNull)
      .select("record_id", "entity_id", "is_new")
  }
}
