package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — assign documents to fixed token-budget packs by greedy
  * prefix-sum placement, the batching step training pipelines run after
  * chunking (concatenate samples until the context window is full; samples
  * never split across packs here — a doc whose tokens straddle a budget
  * boundary starts its pack at its first token's index).
  *
  * pack_id = (global running token count BEFORE the doc) div budget: each doc
  * lands in the pack holding its first token. Deterministic given the
  * ordering column, independent of partitioning.
  *
  * Scale shape: the naive formulation is a single global-window cumsum — one
  * task at 100 TB. This one is the offsets trick from
  * [[Chunking.boundariesDistributed]] with a DETERMINISTIC bucket key
  * (id div bucketSize, not spark_partition_id): per-bucket window cumsums run
  * in parallel, the per-bucket totals (corpus/bucketSize rows — tiny) cumsum
  * once and broadcast back as offsets. No global window anywhere; output is
  * bit-identical to the naive form (same DuckDB oracle).
  */
object Packing {

  def packSequences(docs: DataFrame, budget: Long = 256, bucketSize: Long = 64,
                    text: String = "text", id: String = "doc_id"): DataFrame = {
    val nTokens: Column = size(split(trim(col(text)), "\\s+")).cast("long")
    packCounts(docs.select(col(id), nTokens.as("n_tokens")),
      budget, bucketSize, id)
  }

  /** Same placement over PRE-COMPUTED token counts — the form downstream of
    * a scrub/tokenize stage whose counts differ from whitespace tokens. */
  def packCounts(counts: DataFrame, budget: Long = 256, bucketSize: Long = 64,
                 id: String = "doc_id"): DataFrame = {
    require(budget > 0 && bucketSize > 0, "budget and bucketSize must be positive")
    val base = counts.select(col(id), col("n_tokens"),
      expr(s"cast($id as bigint) div $bucketSize").as("__b"))

    // parallel per-bucket cumsums; bucket totals cumsum over the (tiny)
    // bucket table only, broadcast back — the offsets trick
    val wLocal = Window.partitionBy("__b").orderBy(id)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = base.withColumn("__run_local", sum("n_tokens").over(wLocal))

    val wOff = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy("__b").agg(sum("n_tokens").as("__tot"))
      .withColumn("__offset", coalesce(sum("__tot").over(wOff), lit(0L)))
      .select("__b", "__offset")

    local.join(broadcast(offsets), "__b")
      .withColumn("token_start", col("__offset") + col("__run_local") - col("n_tokens"))
      .withColumn("pack_id", expr(s"token_start div $budget"))
      .select(col(id), col("n_tokens"), col("token_start"), col("pack_id"))
      .orderBy(id)
  }

  /** FIM (fill-in-the-middle) transformation — the code-model pretraining
    * op: a `ratePct`% subset of documents has its token sequence split at
    * two cut points into (prefix, middle, suffix) and re-emitted in PSM
    * order with sentinel markers, teaching the model to infill; the rest
    * pass through untouched. Selection AND cut points are content-addressed
    * (md5 of doc_id) — no RNG, so the same corpus produces the same
    * training stream on any cluster, any partitioning, any engine, and an
    * epoch can be regenerated instead of stored.
    *
    * Cut-point contract: 1 <= c1 < c2 <= n-1 — all three parts non-empty;
    * documents under 4 tokens pass through (no room for three parts).
    *
    * Scale shape: pure narrow per-row maps (tokenize, two hashes, three
    * slices, join) — zero exchange beyond the final presentation sort. */
  def fimTransform(docs: DataFrame, ratePct: Int = 50,
                   text: String = "text", id: String = "doc_id"): DataFrame = {
    val toks = split(trim(regexp_replace(lower(col(text)), "[^a-z0-9]+", " ")), " ")
    def h(off: Int) =
      conv(substring(md5(concat(col(id).cast("string"), lit("_fim"))),
        off, 13), 16, 10).cast("long")
    val base = docs.select(col(id), toks.as("w"))
      .withColumn("n", size(col("w")).cast("long"))
    val eligible = col("n") >= 4 && pmod(h(1), lit(100)) < ratePct
    val c1 = lit(1L) + pmod(h(14), col("n") - 2)          // 1 .. n-2
    val c2 = col("c1") + 1L + pmod(h(27), col("n") - col("c1") - 1) // c1+1 .. n-1
    base
      .withColumn("fim_applied", eligible)
      .withColumn("c1", when(eligible, c1))
      .withColumn("c2", when(eligible, c2))
      .withColumn("fim_text",
        when(col("fim_applied"),
          concat(lit("<PRE> "),
            array_join(slice(col("w"), lit(1), col("c1").cast("int")), " "),
            lit(" <SUF> "),
            array_join(slice(col("w"), (col("c2") + 1).cast("int"),
              (col("n") - col("c2")).cast("int")), " "),
            lit(" <MID> "),
            array_join(slice(col("w"), (col("c1") + 1).cast("int"),
              (col("c2") - col("c1")).cast("int")), " ")))
          .otherwise(array_join(col("w"), " ")))
      .select(col(id), col("n").as("n_tokens"), col("fim_applied"),
        col("c1"), col("c2"), col("fim_text"))
      .orderBy(id)
  }
}
