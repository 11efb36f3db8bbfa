package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LINE-level boilerplate removal — the CCNet/RefinedWeb curation stage that
  * whole-document and span dedup both miss at the right grain: a nav menu,
  * cookie banner, or license footer repeated across MANY documents is
  * removed line-by-line while each document's unique prose survives. The
  * classic recipe: hash every line, count how many DOCUMENTS each distinct
  * line appears in, drop lines above a corpus-fraction threshold, and
  * reconstruct each document from its kept lines in order.
  *
  * Grain: the fixtures carry single-line texts, so the "line" view is a
  * deterministic fixed-width word chunking ([[lines]]); the operator is
  * grain-agnostic — feed it `split(text, '\n')` lines and nothing else
  * changes. (Contrast with [[Dedup]]'s passage lane: that marks stride-1
  * token WINDOWS duplicated >= 2 times anywhere — substring resolution;
  * this lane drops whole segments repeated across a FRACTION of the corpus
  * — boilerplate resolution. Both run in a real pipeline.)
  *
  * Scale shape at 100 TB: the document-frequency pass exchanges
  * (16-byte md5, doc_id) pairs — never line text — through two map-side
  * combinable aggregates. The boilerplate head (lines above the threshold)
  * is small by the Zipf argument that motivates the stage, so it BROADCASTS
  * into a LEFT ANTI against the line stream: the corpus-sized side is
  * touched by one narrow hash + one broadcast join, and the only wide
  * exchange of document content is the per-doc reconstruction groupBy
  * (doc-keyed, carrying kept lines only). The threshold itself is derived
  * in-plan from a 1-row corpus count (integer cross-multiply — no config
  * drift between the count and the data it gates).
  */
object LineDedup {

  /** Fixed-width line view of single-line fixture docs: consecutive
    * `wordsPerLine`-word chunks as (doc_id, line_no, line). */
  def lines(docs: DataFrame, wordsPerLine: Int): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("__w"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0),
            ((size(col("__w")) - 1) / wordsPerLine).cast("int")),
          i => array_join(
            slice(col("__w"), i * wordsPerLine + 1, lit(wordsPerLine)), " "))))
      .toDF("doc_id", "line_no", "line")

  /** Per-distinct-line document frequency — the maintainable STATE of this
    * stage: (16-byte digest, carried text, doc_freq). Two map-side
    * combinable aggregates; the per-(digest, doc) combine dedups in-doc
    * repeats before the count and carries the text without widening the
    * key (min == identity: equal digests are equal lines). */
  def docFreq(docs: DataFrame, wordsPerLine: Int): DataFrame = {
    val ln = lines(docs, wordsPerLine)
      .withColumn("__h", md5(col("line")))
    ln.groupBy(col("__h"), col("doc_id"))
      .agg(min(col("line")).as("line"))
      .groupBy("__h")
      .agg(count(lit(1)).as("doc_freq"), min(col("line")).as("line"))
  }

  /** The boilerplate head: distinct lines present in at least
    * `1/denomFrac` of all documents, with their document frequency. */
  def boilerplateLines(docs: DataFrame, wordsPerLine: Int,
                       denomFrac: Int): DataFrame = {
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    docFreq(docs, wordsPerLine).crossJoin(broadcast(nDocs))
      .filter(col("doc_freq") * denomFrac >= col("n_docs"))
      .select(col("line"), col("__h"), col("doc_freq"), col("n_docs"),
        (col("doc_freq").cast("double") / col("n_docs").cast("double"))
          .as("doc_share"))
  }

  /** Merge a maintained history frequency table with a new batch's counts —
    * the incremental-ingest state update: one full-outer on the digest,
    * counts sum. History DOCUMENTS are never rescanned; the state is
    * vocabulary-grain (distinct lines), orders smaller than the corpus. */
  def mergeDocFreq(histFreq: DataFrame, batchFreq: DataFrame): DataFrame =
    histFreq.select(col("__h"), col("line").as("__hl"),
        col("doc_freq").as("__hf"))
      .join(batchFreq.select(col("__h"), col("line").as("__bl"),
        col("doc_freq").as("__bf")), Seq("__h"), "full_outer")
      .select(col("__h"),
        coalesce(col("__hl"), col("__bl")).as("line"),
        (coalesce(col("__hf"), lit(0L)) + coalesce(col("__bf"), lit(0L)))
          .as("doc_freq"))

  /** Per-document boilerplate scrub report: line counts before/after and
    * the reconstructed text with boilerplate lines cut. Documents whose
    * every line is boilerplate come back with empty `text_kept` — a
    * downstream length gate drops them, attribution intact. */
  def scrub(docs: DataFrame, wordsPerLine: Int, denomFrac: Int): DataFrame =
    scrubAgainst(docs, wordsPerLine,
      boilerplateLines(docs, wordsPerLine, denomFrac).select("__h"))

  /** Scrub `docs` against a given boilerplate digest set (broadcast into
    * the LEFT ANTI) and rebuild per-doc text from the kept lines. */
  private def scrubAgainst(docs: DataFrame, wordsPerLine: Int,
                           hot: DataFrame): DataFrame = {
    val ln = lines(docs, wordsPerLine)
      .withColumn("__h", md5(col("line")))
    val kept = ln.join(broadcast(hot), Seq("__h"), "left_anti")
    val rebuilt = kept.groupBy("doc_id").agg(
      count(lit(1)).as("kept_lines"),
      array_join(
        transform(
          array_sort(collect_list(struct(col("line_no"), col("line")))),
          s => s("line")),
        " ").as("text_kept"))
    ln.groupBy("doc_id").agg(count(lit(1)).as("n_lines"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        coalesce(col("kept_lines"), lit(0L)).as("kept_lines"),
        (col("n_lines") - coalesce(col("kept_lines"), lit(0L)))
          .as("dropped_lines"),
        coalesce(col("text_kept"), lit("")).as("text_kept"))
      .orderBy("doc_id")
  }

  /** Incremental-ingest scrub: clean TODAY'S batch against the corpus-wide
    * boilerplate threshold WITHOUT rescanning history. Inputs are the
    * maintained state — history's frequency table ([[docFreq]]) and its
    * 1-row document count — plus the new batch; the frequencies merge
    * ([[mergeDocFreq]]), the threshold re-derives in-plan from the summed
    * counts, and only batch documents are scrubbed. Exactly equal to the
    * from-scratch [[scrub]] over history ∪ batch restricted to batch docs
    * (spec-asserted): doc frequency is a sum, so the merged state IS the
    * global state.
    *
    * Scale contract: history documents contribute one vocabulary-grain
    * frequency relation and one count — never rows. The batch-sized side
    * does all row work. */
  def scrubIncremental(histFreq: DataFrame, histDocCount: DataFrame,
                       batch: DataFrame, wordsPerLine: Int,
                       denomFrac: Int): DataFrame = {
    val merged = mergeDocFreq(histFreq, docFreq(batch, wordsPerLine))
    val nDocs = histDocCount.select(col("n_docs").as("__nh"))
      .crossJoin(batch.agg(count(lit(1)).as("__nb")))
      .select((col("__nh") + col("__nb")).as("n_docs"))
    val hot = merged.crossJoin(broadcast(nDocs))
      .filter(col("doc_freq") * denomFrac >= col("n_docs"))
      .select("__h")
    scrubAgainst(batch, wordsPerLine, hot)
  }
}
