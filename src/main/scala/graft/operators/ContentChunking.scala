package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC): split each document at positions where a
  * rolling window digest hits a mask — the Rabin/Gear-style boundary rule
  * dedup file systems and RAG ingestion pipelines use instead of fixed-size
  * chunking. The payoff is edit RESYNC: inserting or deleting one token
  * shifts every fixed-size chunk after the edit, but content-defined
  * boundaries depend only on the local window, so all chunks outside the
  * edit neighborhood keep their digests — chunk-level dedup between corpus
  * versions then dedups the unchanged tail instead of re-storing it
  * (property-tested in `ContentChunkingSpec`).
  *
  * Scale contract: the whole computation is PER-DOCUMENT — window digests,
  * boundary selection, and chunk assembly all run as higher-order functions
  * over the token array inside one row, then a narrow `explode` emits chunk
  * rows. ZERO exchanges (the final `orderBy` is presentation-only): at
  * 100 TB the scan's partitioning flows through untouched, and there is no
  * doc-keyed shuffle a window-function formulation would force.
  *
  * Boundary rule: position i (1-based, i >= window) ends a chunk when the
  * 60-bit md5 of the window's last `window` tokens is ≡ 0 mod `divisor`
  * (expected chunk length ≈ divisor tokens); the document end is always a
  * boundary. Docs shorter than `window` yield one whole-doc chunk. md5
  * keeps boundaries engine-portable and content-addressed — same text,
  * same chunks, on any engine, under any partitioning.
  */
object ContentChunking {

  /** Per-chunk rows: (doc_id, chunk_id, chunk_start, chunk_end, chunk_len,
    * chunk_md5) with 1-based inclusive token positions. */
  def cdcChunks(docs: DataFrame, window: Int = 4, divisor: Int = 16): DataFrame = {
    val w = split(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")), " ")
    val n = size(w)
    // boundary positions: window..n whose window digest hits the mask, plus
    // the document end — computed by the one-pass native expression
    // (round-10 measured rewrite; the HOF twin below is parity-pinned in
    // ContentChunkingSpec: per window it allocated a slice, joined it,
    // hex-encoded the digest and string-parsed 15 hex chars back to a long)
    val rows = docs.select(col("doc_id"), w.as("w"), n.as("n"))
      .withColumn("bounds", graft.functions.TextScoreFunctions
        .cdc_boundaries(col("w"), window, divisor))
      .select(col("doc_id"), col("w"),
        explode(transform(col("bounds"), (b, idx) => struct(
          (idx + 1).as("chunk_id"),
          when(idx === 0, lit(1))
            .otherwise(element_at(col("bounds"), idx) + 1).as("chunk_start"),
          b.as("chunk_end")))).as("c"))
    rows.select(
        col("doc_id"),
        col("c.chunk_id").cast("long").as("chunk_id"),
        col("c.chunk_start").cast("long").as("chunk_start"),
        col("c.chunk_end").cast("long").as("chunk_end"),
        (col("c.chunk_end") - col("c.chunk_start") + 1).cast("long").as("chunk_len"),
        md5(array_join(
          slice(col("w"), col("c.chunk_start"),
            col("c.chunk_end") - col("c.chunk_start") + 1), " ")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_id")
  }

  /** The portable HOF twin of the native boundary scan, kept for parity
    * specs ([[graft.functions.CdcBoundaries]] must match it corner for
    * corner): candidate positions window..n whose digest hits the mask,
    * plus the document end; array_distinct since n may hit twice. */
  private[graft] def cdcBoundariesHof(toks: Column, n: Column,
                                      window: Int, divisor: Int): Column = {
    def winDigest(i: Column) =
      conv(substr(md5(array_join(slice(toks, i - window + 1, lit(window)), " ")),
        lit(1), lit(15)), 16, 10).cast("long")
    array_distinct(concat(
      filter(
        when(n >= window, sequence(lit(window), n))
          .otherwise(array().cast("array<int>")),
        i => winDigest(i) % divisor === 0),
      array(n)))
  }

  /** Cross-version chunk dedup — the CDC payoff as an operator: chunk two
    * corpus versions content-defined, then count per doc how many of the
    * NEW version's chunks already exist in the old version (anywhere — the
    * match is content-addressed, not position-addressed). Under fixed-size
    * chunking a one-token edit shifts every downstream chunk and the reuse
    * rate collapses; under CDC only the edit neighborhood re-stores.
    *
    * Scale shape: both sides reduce to (digest) sets BEFORE meeting — the
    * only co-shuffle carries 16-byte digests, never text; the join is
    * digest-keyed (LEFT SEMI against the old version's distinct digests),
    * then a per-doc count. At 100 TB this is the incremental-storage
    * estimator for a corpus refresh: `reused_ratio` near 1 means the
    * refresh stores (and re-embeds, re-tokenizes…) almost nothing. */
  def chunkReuse(oldDocs: DataFrame, newDocs: DataFrame,
                 window: Int = 4, divisor: Int = 16): DataFrame = {
    val oldDigests = cdcChunks(oldDocs, window, divisor)
      .select("chunk_md5").distinct()
    val newChunks = cdcChunks(newDocs, window, divisor)
      .select("doc_id", "chunk_md5")
    val reused = newChunks.join(oldDigests, Seq("chunk_md5"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_reused"))
    newChunks.groupBy("doc_id").agg(count(lit(1)).as("n_chunks"))
      .join(reused, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("n_reused"), lit(0L)).as("n_reused"))
      .withColumn("reused_ratio",
        col("n_reused").cast("double") / col("n_chunks").cast("double"))
      .orderBy("doc_id")
  }
}
