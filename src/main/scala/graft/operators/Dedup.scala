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

  /** Duplicate-cluster assignment: connected components over a pairwise
    * near-dup relation — the transitive-closure step real dedup pipelines
    * run between pair detection and survivor selection (A~B and B~C must
    * land in ONE cluster even when A~C was never emitted).
    *
    * Iterative min-label propagation with POINTER HALVING: each round first
    * takes label(v) <- min(label(v), min over neighbors of label(u)), then
    * shortcuts label(v) <- label(label(v)). Labels are always vertex ids
    * within the component, so the shortcut stays inside the component while
    * halving path lengths — convergence in O(log diameter) rounds instead
    * of O(diameter), which matters on chain-shaped near-dup graphs (a
    * 30-deep chain converges in 5 rounds, not 30). Each round is two
    * shuffles keyed on vertex id over the PAIR-MEMBER set only (corpus size
    * is irrelevant).
    *
    * Per-round materialization breaks lineage growth (exponential
    * otherwise). With `checkpointDir` set, rounds use RELIABLE
    * `checkpoint` — on a real cluster, `localCheckpoint` blocks live on
    * executors and an executor loss mid-loop is unrecoverable; a
    * filesystem checkpoint survives it. The local[32] default keeps
    * executor-local blocks (no cluster to lose). The loop throws rather
    * than returning a half-converged labeling. */
  def dedupClusters(pairs: DataFrame, maxIters: Int = 30,
                    checkpointDir: Option[String] = None): DataFrame = {
    // Checkpoint-dir hygiene: setCheckpointDir mutates GLOBAL SparkContext
    // state, so (a) each invocation checkpoints into its own unique
    // subdirectory — repeated runs never interleave files — and (b) the
    // context's previous dir is restored before returning, so this call
    // can't silently redirect other jobs' checkpoints. The run directory
    // itself must outlive this call (the returned frame reads its final
    // checkpoint from it); callers delete it once the result is persisted
    // downstream — printed path makes that a one-liner.
    val sc = pairs.sparkSession.sparkContext
    val prevDir = sc.getCheckpointDir
    checkpointDir.foreach { base =>
      sc.setCheckpointDir(s"$base/graft-cc-${java.util.UUID.randomUUID}")
    }
    def save(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    try dedupClustersLoop(pairs, maxIters, save)
    // setCheckpointDir(null) resets to unset (it wraps in Option(...)), so a
    // previously-unset context goes BACK to unset, not to this run's dir
    finally if (checkpointDir.isDefined) sc.setCheckpointDir(prevDir.orNull)
  }

  private def dedupClustersLoop(pairs: DataFrame, maxIters: Int,
                                save: DataFrame => DataFrame): DataFrame = {
    // materialize the pair pipeline ONCE — the symmetric union would
    // otherwise recompute the (expensive) upstream pair detection per branch
    val p = save(pairs.select(col("a_id"), col("b_id")))
    val edges = save(
      p.unionAll(p.select(col("b_id").as("a_id"), col("a_id").as("b_id"))))
    var labels = save(edges.select(col("a_id").as("id")).distinct()
      .withColumn("label", col("id")))
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      val nbrMin = edges.join(labels, edges("b_id") === labels("id"))
        .groupBy(edges("a_id").as("nid")).agg(min("label").as("nbr"))
      val propagated = labels.join(nbrMin, labels("id") === nbrMin("nid"), "left")
        .select(col("id"), col("label"),
          least(col("label"), coalesce(col("nbr"), col("label"))).as("mid"))
      // pointer halving: follow the propagated label one hop — label values
      // are vertex ids, so the lookup is a self-join on the same frame
      val parents = propagated.select(col("id").as("pid"), col("mid").as("plabel"))
      val updated = save(
        propagated.join(parents, propagated("mid") === parents("pid"), "left")
          .select(propagated("id"), propagated("label"),
            least(col("mid"), coalesce(col("plabel"), col("mid"))).as("next")))
      changed = updated.filter(col("next") < col("label")).count()
      labels = updated.select(col("id"), col("next").as("label"))
      iter += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"dedupClusters did not converge within $maxIters iterations")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
      .orderBy("doc_id")
  }

  /** Rows of `batch` whose `key` does NOT already appear in `history` — the
    * recurring-ingest dedup step: yesterday's 100 TB corpus is `history`,
    * today's crawl is `batch`.
    *
    * Scale contract: the history NEVER shuffles. The naive
    * `batch.join(history, key, "left_anti")` hash-partitions the full
    * history; here the (small) batch key set broadcasts into a LEFT SEMI
    * that streams the history scan once and emits only the matched keys —
    * a set bounded by the batch size — which then broadcast back as the
    * ANTI side. Two broadcast joins, one history pass, zero wide exchange
    * of history rows.
    *
    * Both broadcasts are FORCED by default (the batch is small by
    * contract); `broadcastGuardRows` opts into the row-count guard
    * ([[graft.core.Broadcasts.guarded]]) that degrades to plain joins when
    * a batch outgrows the 8 GB broadcast regime. One count guards both
    * hints — the matched key set is a subset of the batch key set. */
  def newAgainstHistory(batch: DataFrame, history: DataFrame, key: String,
                        broadcastGuardRows: Option[Long] = None): DataFrame = {
    val batchKeys = batch.select(col(key)).distinct()
    val fits = broadcastGuardRows.forall(batchKeys.count() <= _)
    def hint(df: DataFrame) = if (fits) broadcast(df) else df
    val matched = history.select(col(key))
      .join(hint(batchKeys), Seq(key), "left_semi")
      .distinct()
    batch.join(hint(matched), Seq(key), "left_anti")
  }

  /** Passage-level (substring) duplication: find every `window`-token
    * span whose normalized text occurs MORE THAN ONCE anywhere in the
    * corpus, and merge the hits into maximal per-document spans — the
    * sliding-window form of suffix-array substring dedup (the "remove any
    * repeated 50-token substring" curation step; cf. dedup literature on
    * substring-duplicated training data). Whole-document dedup
    * ([[exactText]], [[NearDup]]) misses a boilerplate paragraph pasted
    * into otherwise-distinct pages; this lane is what catches it.
    *
    * Semantics: tokens are the usual normalization (lower, non-alnum →
    * space); docs shorter than `window` tokens have no full window and are
    * skipped. A window is duplicated when its md5 occurs >= 2 times
    * globally — across documents or repeated WITHIN one (self-repetition is
    * still duplicated text; the corpus-level signal subsumes the per-doc
    * [[TextAnalysis.repetition]] ratio). Overlapping and adjacent
    * duplicated windows merge into one span (classic island detection:
    * running max of span end per doc); `dup_tokens` is the total token
    * count covered by merged spans, the amount a scrubber would cut.
    * Output rows are only docs with >= 1 duplicated span — absent docs
    * have dup_ratio 0 by construction.
    *
    * Scale shape at 100 TB: windows explode map-side (~n_tokens rows per
    * doc — the price of substring resolution; stride-1 is the algorithm).
    * Duplication marking is ONE hash-partitioned window count on the
    * 128-bit gram digest (per-digest groups are tiny; no join back, no
    * second pass over the stream, and the md5 digest — not the ~16-word
    * gram text — is what shuffles). Survivor span merge shuffles only the
    * DUPLICATED windows (a small fraction of the stream) keyed by doc.
    * Everything is codegen'd built-ins; no UDF. */
  def duplicatedPassages(docs: DataFrame, window: Int = 16,
                         text: String = "text", id: String = "doc_id"): DataFrame =
    duplicatedSpans(docs, window, text, id)
      .groupBy(col(id), col("n_tokens"))
      .agg(count(lit(1)).as("n_dup_spans"),
           sum(col("span_end") - col("span_start") + 1).as("dup_tokens"))
      .withColumn("dup_ratio",
        col("dup_tokens").cast("double") / col("n_tokens").cast("double"))
      .orderBy(id)

  /** The span table behind [[duplicatedPassages]]: one row per maximal
    * duplicated span — `(doc_id, n_tokens, span_start, span_end)`, 1-based
    * inclusive token positions into the NORMALIZED token sequence. Shared
    * by the report form (aggregates it) and the scrub form (cuts it). */
  def duplicatedSpans(docs: DataFrame, window: Int = 16,
                      text: String = "text", id: String = "doc_id"): DataFrame = {
    require(window > 1, "need window > 1")
    val w = split(trim(regexp_replace(lower(col(text)), "[^a-z0-9]+", " ")), " ")
    val staged = graft.core.Parallelism.forCompute(docs)
      .select(col(id), w.as("__w"))
      .filter(size(col("__w")) >= window)
    // pos is 1-based token index of the window start; h is the 128-bit digest
    val wins = staged.select(col(id), size(col("__w")).cast("long").as("n_tokens"),
        posexplode(transform(
          sequence(lit(1), size(col("__w")) - (window - 1)),
          i => md5(concat_ws(" ", slice(col("__w"), i, lit(window)))))).as(Seq("p0", "h")))
      .select(col(id), col("n_tokens"), (col("p0") + 1).cast("long").as("pos"), col("h"))
    val dup = wins
      .withColumn("__c", count(lit(1)).over(Window.partitionBy("h")))
      .filter(col("__c") > 1)
    val byDoc = Window.partitionBy(id).orderBy("pos")
    val spanEnd = col("pos") + (window - 1)
    val prevMaxEnd = max(spanEnd)
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    dup
      .withColumn("__new",
        when(prevMaxEnd.isNull || col("pos") > prevMaxEnd + 1, 1L).otherwise(0L))
      .withColumn("__island",
        sum(col("__new")).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(id), col("n_tokens"), col("__island"))
      .agg(min("pos").as("span_start"), max(spanEnd).as("span_end"))
      .drop("__island")
  }

  /** The ACTIONABLE form of [[duplicatedPassages]]: cut every duplicated
    * span out of each document and return the scrubbed token stream — what
    * the substring-dedup curation step actually writes ("remove any
    * repeated window-token substring", keeping no copy of the repeated
    * region; exact-duplicate DOCUMENTS therefore scrub to empty, which is
    * whole-doc dedup's business to survive one copy of, not this lane's).
    *
    * Output per doc (ALL docs, scrubbed or not): the normalized-token
    * count, kept-token count, and the scrubbed text's md5 (`scrub_md5` —
    * hash rather than payload keeps the result frame narrow; the full
    * text form is a one-line `concat_ws` away for a writer).
    *
    * Scale shape: span detection as in [[duplicatedSpans]]; spans then
    * aggregate to one small array per affected doc and join back keyed on
    * doc id (affected docs only — a left join whose right side is the
    * duplicated minority); the cut itself is a narrow indexed-lambda
    * filter over the token array. Document payloads shuffle at most once
    * (the span join); tokens never explode for the cut. */
  def scrubDuplicatedPassages(docs: DataFrame, window: Int = 16,
                              text: String = "text", id: String = "doc_id"): DataFrame =
    keptTokens(docs, window, text, id)
      .select(col(id), col("n_tokens"),
        size(col("__kept")).cast("long").as("n_kept"),
        md5(concat_ws(" ", col("__kept"))).as("scrub_md5"))
      .orderBy(id)

  /** Scrubbed documents as TEXT — the form downstream stages (chunking,
    * tokenization) consume. The text is the NORMALIZED kept-token stream;
    * docs scrubbed to nothing come back with empty text (filter on
    * `n_kept > 0` to drop them). */
  def scrubbedDocs(docs: DataFrame, window: Int = 16,
                   text: String = "text", id: String = "doc_id"): DataFrame =
    keptTokens(docs, window, text, id)
      .select(col(id), size(col("__kept")).cast("long").as("n_kept"),
        concat_ws(" ", col("__kept")).as(text))

  /** Shared cut: every doc's normalized token array minus duplicated-span
    * tokens (`__kept`), via the span-array join + indexed-lambda filter. */
  private def keptTokens(docs: DataFrame, window: Int,
                         text: String, id: String): DataFrame = {
    val spans = duplicatedSpans(docs, window, text, id)
      .groupBy(col(id))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("__spans"))
    val w = split(trim(regexp_replace(lower(col(text)), "[^a-z0-9]+", " ")), " ")
    val staged = graft.core.Parallelism.forCompute(docs).select(col(id), w.as("__w"))
    staged.join(spans, Seq(id), "left")
      .select(col(id), size(col("__w")).cast("long").as("n_tokens"),
        when(col("__spans").isNull, col("__w"))
          .otherwise(filter(col("__w"), (tok, i) =>
            !exists(col("__spans"), s =>
              (i + 1 >= s("span_start")) && (i + 1 <= s("span_end")))))
          .as("__kept"))
  }

  /** One survivor (the min doc_id) per duplicate CLUSTER. Strictly stronger
    * than dropping the larger id of each pair: with pairs (B,C) and (A,C)
    * only, pairwise dropping keeps both A and B from one duplicate group;
    * the component closure keeps exactly A. Docs in no pair pass through. */
  def clusterSurvivors(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val losers = dedupClusters(pairs)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")
    docs.join(losers, Seq("doc_id"), "left_anti")
  }

  /** One survivor per duplicate cluster chosen by QUALITY rather than id:
    * the member with the highest `score` survives, ties to the smallest
    * id — the curation-grade policy: near-duplicates differing in
    * truncation or boilerplate keep the best copy, not the
    * first-crawled one. Same component closure as [[clusterSurvivors]];
    * the winner pick is one lexicographic max(struct) per cluster —
    * deterministic under any partial-aggregation order. */
  def clusterSurvivorsBy(docs: DataFrame, pairs: DataFrame,
                         score: Column): DataFrame = {
    val clustered = dedupClusters(pairs)
    val scored = docs.select(col("doc_id"), score.as("__score"))
      .join(clustered, "doc_id")
    val winners = scored.groupBy("cluster_id")
      .agg(max(struct(col("__score"), (-col("doc_id")).as("__negid"))).as("__w"))
      .select((-col("__w.__negid")).as("w_id"))
    val losers = scored
      .join(winners, scored("doc_id") === winners("w_id"), "left_anti")
      .select("doc_id")
    docs.join(losers, Seq("doc_id"), "left_anti")
  }

  /** SOFT dedup: REWEIGHT duplicates instead of removing them — every doc
    * gets sampling weight 1/|its duplicate cluster|, so each duplicate
    * GROUP contributes one unit of training mass however many copies
    * exist (the SoftDeDup recipe: hard removal throws away the signal
    * that near-copies carry slightly different text; down-weighting keeps
    * the best of both). Docs in no duplicate pair form singleton clusters
    * with weight 1. The weight column feeds directly into the weighted
    * samplers ([[graft.operators.Sampling]]) or a loss-scaling column.
    *
    * Exactness: weight = 1.0 / size is one IEEE division of an exact
    * integer — engine-identical.
    *
    * Scale shape: the cluster closure works on id PAIRS only
    * ([[dedupClusters]]); labeling the full corpus is one id-keyed join,
    * sizes are one cluster-keyed count rejoined key-on-key — the doc
    * stream shuffles twice on 8-byte keys, text/payloads never ride
    * along (join the weight back by id downstream). */
  def softDedupWeights(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val labeled = docs.select(col("doc_id"))
      .join(dedupClusters(pairs), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
    val sizes = labeled.groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
    labeled.join(sizes, Seq("cluster_id"))
      .withColumn("weight",
        lit(1.0).cast("double") / col("cluster_size").cast("double"))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        col("weight"))
      .orderBy("doc_id")
  }
}
