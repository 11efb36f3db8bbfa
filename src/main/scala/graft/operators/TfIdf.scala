package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF-weighted text similarity — the weighted complement to the set-based
  * (Jaccard) lanes: rare terms dominate the score instead of counting equally.
  *
  * Determinism engineering: the idf is the BM25-style RATIONAL weight
  * (N - df + 0.5)/(df + 0.5) rather than a logarithm — `ln` may differ in the
  * last ulp between libm implementations, a rational of exact integers cannot.
  * All dot/norm sums go through DECIMAL casts (exact, order-insensitive), so
  * scores are bit-identical across engines and partitionings.
  *
  * Scale shape: one token-frequency aggregate (the vocabulary, broadcastable),
  * per-doc norms as a decimal aggregate, and a shared-token join restricted to
  * the (broadcast) query side — the corpus shuffles only tokens matching a
  * query term, never full documents.
  */
object TfIdf {

  private def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(split(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")), " "))
        .as("tok"))
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("tf"))

  /** Weighted top-k similar documents for each query doc (doc_id < nQueries). */
  def topKSimilar(docs: DataFrame, nQueries: Int = 8, k: Int = 5): DataFrame = {
    val tok = tokens(docs)
    val n = docs.select(count(lit(1)).as("n_docs"))
    val dfreq = tok.groupBy("tok").agg(count(lit(1)).as("df"))
      .crossJoin(n)
      .withColumn("w",
        (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
      .select("tok", "w")

    val weighted = tok.join(broadcast(dfreq), "tok")
      .select(col("doc_id"), col("tok"), (col("w") * col("tf")).as("wt"))
    val norms = weighted.groupBy("doc_id")
      .agg(sqrt(sum((col("wt") * col("wt")).cast("decimal(38,8)")).cast("double"))
        .as("norm"))

    val q = weighted.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("q_id"), col("tok"), col("wt").as("q_wt"))
    val c = weighted.select(col("doc_id").as("n_id"), col("tok"), col("wt").as("n_wt"))
    val dot = c.join(broadcast(q), "tok")
      .filter(col("q_id") =!= col("n_id"))
      .groupBy("q_id", "n_id")
      .agg(sum((col("q_wt") * col("n_wt")).cast("decimal(38,8)")).cast("double")
        .as("dot"))

    val scored = dot
      .join(norms.select(col("doc_id").as("q_id"), col("norm").as("qn")), "q_id")
      .join(norms.select(col("doc_id").as("n_id"), col("norm").as("nn")), "n_id")
      .withColumn("sim", col("dot") / (col("qn") * col("nn")))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id").asc)
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("q_id", "rk", "n_id", "sim")
      .orderBy("q_id", "rk")
  }

  /** Full BM25 ranking — [[topKSimilar]]'s idf plus the two things BM25
    * actually adds: TF SATURATION (a term's 50th occurrence is worth
    * almost nothing more than its 5th — k1 caps the contribution) and
    * LENGTH NORMALIZATION (b discounts long documents toward the corpus
    * average length). Query docs (doc_id < nQueries) score candidates over
    * their DISTINCT terms, the standard short-query convention.
    *
    * Determinism: idf is rational (no ln — same discipline as
    * [[topKSimilar]]); the per-term weight is a fixed-order chain of IEEE
    * double ops; the per-pair sum goes through decimal(38,8) so partial
    * aggregation order can't move it.
    *
    * Scale shape: identical to [[topKSimilar]] — vocab-sized (term, idf)
    * table broadcasts, query term set broadcasts, ONE (query, candidate)
    * groupBy carries the corpus-grain work; avgdl is a 1-row broadcast. */
  def bm25TopK(docs: DataFrame, nQueries: Int = 8, k: Int = 5,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tok = tokens(docs)
    val dl = tok.groupBy("doc_id")
      .agg(sum(col("tf")).cast("long").as("dl"))
    val avgdl = dl.agg(
      (sum(col("dl").cast("decimal(28,2)")).cast("double") /
        count(lit(1))).as("avgdl"))
    val n = docs.select(count(lit(1)).as("n_docs"))
    val idf = tok.groupBy("tok").agg(count(lit(1)).as("df"))
      .crossJoin(n)
      .withColumn("idf",
        (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
      .select("tok", "idf")
    val q = tok.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("q_id"), col("tok"))
    val cand = tok.join(broadcast(idf), "tok")
      .join(dl, "doc_id").crossJoin(broadcast(avgdl))
      .select(col("doc_id").as("n_id"), col("tok"),
        (col("idf") * (col("tf") * (lit(k1) + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) +
            lit(b) * col("dl").cast("double") / col("avgdl")))).as("w"))
    val scored = cand.join(broadcast(q), "tok")
      .filter(col("q_id") =!= col("n_id"))
      .groupBy("q_id", "n_id")
      .agg(sum(col("w").cast("decimal(38,8)")).cast("double").as("bm25"))
    val w = Window.partitionBy("q_id").orderBy(col("bm25").desc, col("n_id").asc)
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("q_id", "rk", "n_id", "bm25")
      .orderBy("q_id", "rk")
  }

  /** INVERTED INDEX construction: term → document-frequency + a capped,
    * sorted posting list — the search-engine build step (and the exchange
    * format for cross-corpus decontamination audits). Postings are capped
    * at `maxPostings` ids per term and serialized as a comma string so the
    * relation stays bounded and engine-comparable; `df` keeps the true
    * count regardless of the cap.
    *
    * Scale shape: one distinct (doc, term) pass, one term-keyed groupBy.
    * The collect_list is bounded per term only after sort+slice — for
    * web-scale df a two-stage cap (per-partition top-N then merge) is the
    * refinement; at the cap sizes an audit index uses, the per-term list
    * is the cheaper single pass. */
  def invertedIndex(docs: DataFrame, minDf: Long = 5, maxPostings: Int = 20,
                    k: Int = 100): DataFrame = {
    val tok = docs.select(col("doc_id"),
        explode(split(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")),
          " ")).as("tok"))
      .filter(col("tok") =!= "").distinct()
    tok.groupBy("tok")
      .agg(count(lit(1)).as("df"),
        concat_ws(",", transform(
          slice(sort_array(collect_list(col("doc_id"))), 1, maxPostings),
          x => x.cast("string"))).as("postings"))
      .filter(col("df") >= minDf)
      .orderBy(col("df").desc, col("tok")).limit(k)
      .orderBy("tok")
  }

  /** KEYWORD EXTRACTION: each document's top-k terms by tf x idf — the
    * per-doc summarization/tagging primitive (index keys, faceted browse,
    * weak topic labels for mixture analysis). Same rational BM25-style idf
    * as [[topKSimilar]] (no `ln`, engine-exact).
    *
    * Scale shape: the (vocab-sized) term-weight table broadcasts into the
    * per-doc term stream; ranking is a per-doc window over that doc's own
    * DISTINCT terms (bounded by doc length) — one doc-keyed shuffle
    * total. */
  def topTermsPerDoc(docs: DataFrame, k: Int = 3): DataFrame = {
    val tok = tokens(docs)
    val n = docs.select(count(lit(1)).as("n_docs"))
    val dfreq = tok.groupBy("tok").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .withColumn("w", (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
      .select("tok", "df", "w")
    val rankW = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("tok").asc)
    tok.join(broadcast(dfreq), "tok")
      .withColumn("score", col("w") * col("tf"))
      .withColumn("rk", row_number().over(rankW).cast("long"))
      .filter(col("rk") <= k)
      .select("doc_id", "rk", "tok", "tf", "df", "score")
      .orderBy("doc_id", "rk")
  }
}
