package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** End-to-end training-data curation — the use-case the extension operators
  * exist for, composed into one declarative plan:
  *
  *   1. quality gate: length bounds + stopword-ratio floor (TextAnalysis)
  *   2. language gate: predicted language must match the labeled one
  *   3. exact dedup: one survivor per normalized-text fingerprint (Dedup)
  *   4. near-dup removal: MinHash/LSH pairs above Jaccard 0.5; the larger
  *      doc_id of each pair is dropped (NearDup)
  *
  * Everything stays lazy until the sink: Catalyst fuses the quality/language
  * gates into the scan, and only gate-surviving documents reach the
  * (shuffling) dedup stages — filter early, shuffle late, the core curation
  * discipline at 100 TB. */
object CurationPipeline {

  val MinLen = 100L
  val MaxLen = 520L
  val MinStopRatio = 0.03

  def keptDocuments(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)

    val quality = TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), col("len"), col("stop_ratio"))
    val lang = TextAnalysis.langId(docs).select("doc_id", "pred_lang")

    val gated = docs
      .join(quality, "doc_id")
      .join(lang, "doc_id")
      .filter(col("len").between(MinLen, MaxLen) &&
              col("stop_ratio") >= MinStopRatio &&
              col("pred_lang") === col("lang"))
      .select("doc_id", "text")

    // one survivor (smallest doc_id) per exact normalized fingerprint
    val exactSurvivors = Dedup.exactText(gated)
      .select(col("survivor_id").as("doc_id"))
      .join(gated, "doc_id")

    // near-dup pairs among gate survivors; larger id of each pair dropped.
    // (Kept as the kernel's documented semantics; the transitively-closed
    // alternative — exactly one survivor per duplicate COMPONENT — is
    // Dedup.clusterSurvivors, oracle-checked separately as
    // q_dedup_clusters/q_dedup_survivors.)
    val nearDupLosers = NearDup.minhashPairs(exactSurvivors, 0.5)
      .select(col("b_id").as("doc_id")).distinct()

    exactSurvivors.join(nearDupLosers, Seq("doc_id"), "left_anti")
      .select("doc_id")
      .orderBy("doc_id")
  }

  val MaxRepRatio = 0.5
  val EnSamplePct = 50
  val DefaultSamplePct = 90
  val LangQuota = 40

  /** Round-3 capstone v2: the curated set pushed through the remaining
    * corpus-shaping stages — repetition-ratio gate (boilerplate drop),
    * content-addressed stratified downsampling (English to 50%, rest to
    * 90%), and a per-language quota cap. Output is (doc_id, lang, rk).
    *
    * Composition cost at scale: the repetition gate and the sample are
    * narrow maps over the already-curated (small) survivor set; only the
    * final quota window shuffles, keyed on language. */
  def curatedCorpus(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // Shape note (measured, interleaved A/B at sf0.1): the kernel must run
    // exactly once, so `kept` is consumed by exactly one join chain.
    // "Filter-early" variants that join `kept` into the corpus before the
    // repetition pass consume it twice (2x kernel), and checkpointing the
    // kernel to avoid that costs more than recomputing trigrams for the
    // whole corpus (warm 5.5s vs 10.5s). At real scale the kernel output
    // would be persisted to storage between stages, making filter-early
    // free — with an in-memory composition, single-consumption wins.
    val kept = keptDocuments(spark, dir).select("doc_id")
    val rep = TextAnalysis.repetition(docs).select("doc_id", "rep_ratio")
    val base = kept
      .join(docs.select("doc_id", "lang"), "doc_id")
      .join(rep, "doc_id")
      .filter(col("rep_ratio") <= MaxRepRatio)
      .select("doc_id", "lang")
    val sampled = Sampling.stratified(base, "doc_id", "lang",
      Map("en" -> EnSamplePct), DefaultSamplePct)
    Sampling.quotaCap(sampled, "lang", LangQuota, Seq("doc_id"))
      .orderBy("doc_id")
  }
}
