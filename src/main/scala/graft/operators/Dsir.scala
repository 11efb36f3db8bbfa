package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"): score
  * every raw document by how much its hashed n-gram feature distribution
  * looks like a TARGET corpus (wiki-quality seed set) relative to the raw
  * corpus, then keep the top-k. The standard recipe for carving a
  * target-domain-shaped subset out of a web-scale crawl without training a
  * classifier per domain.
  *
  * Design choices, all scale- or oracle-driven:
  *   - Features are hashed unigram buckets (`nBuckets` md5 buckets — the
  *     [[Classifier]] bucketing, engine-portable where xxhash64 is not).
  *     Bucket statistics are ONE map-side-combined aggregation producing at
  *     most `nBuckets` rows regardless of corpus size.
  *   - Importance weights are smoothed probability RATIOS, not log-ratios:
  *     `((t_b+1)/(T+B)) / ((r_b+1)/(R+B))` — every step is an
  *     IEEE-correctly-rounded double op, so Spark and the DuckDB oracle
  *     agree bit-for-bit. `ln` would rank identically (monotone) but is
  *     libm-dependent; the repo-wide rule is no transcendentals in gated
  *     output.
  *   - Per-document score folds the per-token weights IN DOCUMENT ORDER
  *     (`aggregate(transform(...))`) — double addition is order-sensitive,
  *     and a fixed fold order is what makes the score reproducible across
  *     partitionings and engines (the [[Similarity.dot]] discipline).
  *   - The weight table rides into the scoring expression as ONE map
  *     literal (O(nBuckets) collect — the codebook budget), so scoring is a
  *     zero-exchange narrow map over the scan and selection is a
  *     TakeOrdered(k): at 100 TB nothing shuffles except k rows.
  *
  * DSIR proper samples with Gumbel noise over the importance weights; this
  * operator takes the deterministic top-k limit (temperature -> 0), the
  * form a reproducibility-gated pipeline wants. Reference scope: extends the
  * reference's row-level predicate stage (HanaToDBRow.java:83-86) with a
  * corpus-statistics-driven predicate.
  */
object Dsir {
  val NBuckets = 256

  private def tokens(text: Column): Column =
    split(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")), " ")

  private def bucketOf(tok: Column, nBuckets: Int): Column =
    conv(substr(md5(tok), lit(1), lit(15)), 16, 10).cast("long") % nBuckets

  /** Per-bucket importance weights from one pass over the corpus:
    * (f, r, t, weight) where r = raw token count in the bucket, t = count
    * restricted to `targetPred` docs. At most `nBuckets` rows. */
  def bucketWeights(docs: DataFrame, targetPred: Column,
                    nBuckets: Int = NBuckets): DataFrame = {
    val cnt = docs
      .select(explode(tokens(col("text"))).as("tok"),
        when(targetPred, 1L).otherwise(0L).as("is_t"))
      .select(bucketOf(col("tok"), nBuckets).as("f"), col("is_t"))
      .groupBy("f")
      .agg(count(lit(1)).as("r"), sum("is_t").as("t"))
    // corpus totals: one 1-row aggregate broadcast into the weight formula
    val tot = cnt.agg(sum("r").as("rr"), sum("t").as("tt"))
    cnt.crossJoin(broadcast(tot))
      .withColumn("weight",
        ((col("t") + lit(1.0)) / (col("tt") + lit(nBuckets.toDouble))) /
          ((col("r") + lit(1.0)) / (col("rr") + lit(nBuckets.toDouble))))
      .select("f", "r", "t", "weight")
  }

  /** Frozen-weights scoring — the train-batch / apply-anywhere form: weights
    * learned once (from [[bucketWeights]] or a prior run) score any doc
    * frame, INCLUDING a stream (stateless narrow map, no watermark, no
    * state store — the [[Classifier.scoreUnsorted]] streaming contract;
    * agreement asserted in `StreamingOpsSpec`). Unknown buckets (tokens
    * never seen at training time) take the fully-smoothed weight for the
    * given corpus totals. */
  def scoreWith(docs: DataFrame, weights: Map[Long, Double],
                defaultWeight: Double, nBuckets: Int = NBuckets): DataFrame = {
    val wmap = typedlit(weights)
    val toks = tokens(col("text"))
    val perTok = transform(toks,
      t => coalesce(element_at(wmap, bucketOf(t, nBuckets)), lit(defaultWeight)))
    docs.select(col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      aggregate(perTok, lit(0.0), (acc, x) => acc + x).as("score"))
  }

  /** Collected (f -> weight) map plus the unseen-bucket smoothing weight —
    * the O(nBuckets) codebook-sized driver round-trip. */
  def trainedWeights(docs: DataFrame, targetPred: Column,
                     nBuckets: Int = NBuckets): (Map[Long, Double], Double) = {
    val rows = bucketWeights(docs, targetPred, nBuckets)
      .select("f", "r", "t", "weight").collect()
    val w = rows.map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val rr = rows.map(_.getLong(1)).sum
    val tt = rows.map(_.getLong(2)).sum
    // ((0+1)/(T+B)) / ((0+1)/(R+B)) in the same op order as the column form
    val default = (1.0 / (tt + nBuckets.toDouble)) / (1.0 / (rr + nBuckets.toDouble))
    (w, default)
  }

  /** Top-k raw documents by target-likeness score. Output ordered by doc_id
    * (selection order is (score desc, doc_id) — ties broken content-free). */
  def select(docs: DataFrame, targetPred: Column, k: Int = 150,
             nBuckets: Int = NBuckets): DataFrame = {
    // weights become a map literal so scoring never joins or shuffles
    val (weights, default) = trainedWeights(docs, targetPred, nBuckets)
    scoreWith(docs, weights, default, nBuckets)
      .orderBy(col("score").desc, col("doc_id").asc).limit(k)
      .orderBy("doc_id")
  }
}
