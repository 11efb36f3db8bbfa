package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hashed-linear quality-classifier INFERENCE over a document corpus — the
  * fastText/CCNet-filter shape: hash each token into one of `nFeatures`
  * buckets, look the bucket up in a learned weight vector, and keep the
  * per-document margin (integer sum of weights). Model-based quality
  * filtering is the standard step between heuristic signals
  * ([[TextAnalysis.qualityScore]]) and expensive LM scoring in a pretraining
  * curation pipeline.
  *
  * Scale contract (100 TB corpus, fixed-size model):
  *  - The MODEL is a `(feature_id, weight)` relation of `nFeatures` rows —
  *    kilobytes. [[scoreJoin]] broadcast-joins it against the exploded token
  *    stream: works for any model size that fits the broadcast regime, one
  *    doc-keyed shuffle with map-side partial sums.
  *  - [[score]] pins the same model INTO the expression as a map literal
  *    (the "weights in the closure" production form for small models): the
  *    per-document margin folds over the token array with
  *    `aggregate(transform(...))` — ZERO exchange, the scan's partitioning
  *    is preserved, and the whole scoring pipeline is a narrow codegen'd
  *    map. Both forms are asserted bit-identical.
  *  - Weights are integers, so accumulation is exact on any engine and in
  *    any partial-aggregation order — no float nondeterminism in the gate.
  *
  * The fixture model derives its weights content-addressably (md5 of the
  * feature id — a deterministic stand-in for trained weights, the same trick
  * [[Sampling]] uses for uniforms); the plumbing under it — feature hashing,
  * broadcast model, integer margin — is exactly what a trained linear model
  * ships. Reference scope: quality filtering extends the row-level
  * projection/predicate stage of the reference pipeline
  * (HanaToDBRow.java:83-86) the way the rest of the curation family does.
  */
object Classifier {
  val NFeatures = 1024

  /** Token -> feature bucket: 60 md5 bits (always positive, exact in a
    * long) mod `nFeatures`. md5 keeps the bucketing engine-portable where
    * xxhash64 would not be. */
  private[operators] def featureId(tok: Column, nFeatures: Int): Column =
    conv(substr(md5(tok), lit(1), lit(15)), 16, 10).cast("long") % nFeatures

  /** Deterministic integer weight in [-1000, 1000] for a feature id — the
    * fixture stand-in for a learned weight vector. */
  private def weightOf(f: Column): Column =
    conv(substr(md5(concat(lit("w:"), f.cast("string"))), lit(1), lit(15)),
      16, 10).cast("long") % 2001L - 1000L

  /** The model relation: `nFeatures` rows of (feature_id, weight). */
  def model(spark: SparkSession, nFeatures: Int = NFeatures): DataFrame =
    spark.range(nFeatures.toLong)
      .select(col("id").as("feature_id"), weightOf(col("id")).as("weight"))

  private def tokens(text: Column): Column =
    split(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")), " ")

  /** General inference form: explode tokens, broadcast-join the model
    * relation, integer-sum per document. One shuffle (doc-keyed, map-side
    * combined); the model never shuffles. Use when the model is produced by
    * an upstream job (i.e. is a DataFrame, not a literal). */
  def scoreJoin(docs: DataFrame, nFeatures: Int = NFeatures): DataFrame = {
    val spark = docs.sparkSession
    val feats = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .select(col("doc_id"), featureId(col("tok"), nFeatures).as("feature_id"))
    feats.join(broadcast(model(spark, nFeatures)), Seq("feature_id"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum("weight").as("score"))
      .withColumn("label", col("score") > 0)
      .orderBy("doc_id")
  }

  /** Small-model inference form: the collected weight vector rides into the
    * plan as ONE map literal (`nFeatures` entries — the justified tiny
    * collect, same budget as the IVF/PQ codebooks), and scoring folds over
    * the token array per row. No explode, no join, no exchange: at 100 TB
    * this is a pure narrow map over the scan. */
  def score(docs: DataFrame, nFeatures: Int = NFeatures): DataFrame =
    scoreUnsorted(docs, nFeatures).orderBy("doc_id")

  /** [[score]] without the presentation sort — the form a STREAMING
    * pipeline uses directly: stateless, zero-exchange, so it runs
    * per-micro-batch with no watermark or state store at all
    * (stream/batch agreement is asserted in `StreamingOpsSpec`). */
  def scoreUnsorted(docs: DataFrame, nFeatures: Int = NFeatures,
                    keep: Seq[Column] = Nil): DataFrame = {
    val spark = docs.sparkSession
    val weights: Map[Long, Long] = model(spark, nFeatures)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // one-pass native (round-10 measured rewrite): the HOF twin below
    // tokenized twice and paid Catalyst's LINEAR map-literal scan per token
    // (element_at on ArrayBasedMapData); the native hashes each token once
    // against a real HashMap — identical values, ClassifierSpec-pinned.
    // Two-step select: TokenScore is not "cheap", so CollapseProject will
    // not inline it twice across the field reads.
    val ts = graft.functions.TextScoreFunctions
      .token_score(tokens(col("text")), nFeatures, weights)
    val first = docs.select(col("doc_id") +: ts.as("__ts") +: keep: _*)
    // keep columns pass through POSITIONALLY (slots 2..), so a keep named
    // like an output column cannot be silently dropped — but it would
    // still collide in the final schema, so refuse it loudly
    val keepNames = first.columns.drop(2).toSeq
    val reserved = Set("doc_id", "n_feats", "score", "label", "__ts")
    require(keepNames.forall(n => !reserved.contains(n)),
      s"keep column names collide with reserved output columns: " +
        keepNames.filter(reserved.contains).mkString(", "))
    val keepCols = keepNames.map(col)
    first.select(
      (col("doc_id") +:
        col("__ts.n_feats").as("n_feats") +:
        col("__ts.score").as("score") +:
        keepCols) :+
        (col("__ts.score") > 0).as("label"): _*)
  }

  /** The portable HOF twin of [[scoreUnsorted]]'s scoring expression, kept
    * for parity specs: the weight map rides as one literal and scoring
    * folds `element_at(map, featureId(tok))` per token. */
  private[graft] def scoreUnsortedHof(docs: DataFrame,
                                      nFeatures: Int = NFeatures): DataFrame = {
    val spark = docs.sparkSession
    val weights: Map[Long, Long] = model(spark, nFeatures)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wmap = typedlit(weights)
    val perTok = transform(tokens(col("text")),
      t => element_at(wmap, featureId(t, nFeatures)))
    docs.select(
        col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_feats"),
        aggregate(perTok, lit(0L), (acc, x) => acc + x).as("score"))
      .withColumn("label", col("score") > 0)
  }

  /** Reliability diagram + expected calibration error (ECE) for a scored
    * corpus against a boolean truth column — the eval that decides whether
    * a quality classifier's scores can be READ as probabilities (and so
    * whether score-thresholded admission quotas mean what they claim).
    *
    * The margin squashes to a probability through the ALGEBRAIC sigmoid
    * `p = 1/2 + s / (2·(S + |s|))` computed entirely in integer
    * micro-units (`p_micro = 500000 + (500000·|s|) div (S + |s|)`,
    * signed) — transcendental-free (the logistic's exp is banned
    * house-wide) and exactly reproducible on any engine: integer division
    * is truncation on a non-negative numerator. Bins are fixed decile
    * ranges of p; per bin the report carries the exact integer evidence
    * (`n`, `n_pos`, `sum_p_micro`) and one final IEEE division each for
    * `confidence` (mean p) and `accuracy` (positive rate). ECE folds the
    * SAME integer evidence — Σ_b |10⁶·pos_b − Σp_micro,b| / (10⁶·N) — so
    * the weighted-gap sum happens in exact integers, with division the
    * only float op.
    *
    * Scale: one row-grain aggregate to ≤10 bin rows (map-side combined);
    * the ECE window runs over the 10-row report frame. */
  def calibrationReport(scored: DataFrame, scoreCol: String,
                        truthCol: String, scale: Long = 20000L): DataFrame = {
    // exact floor division for non-negative longs: subtract the remainder
    // first, so the one float divide is of an exactly-divisible pair
    def idiv(a: Column, b: Column): Column = ((a - pmod(a, b)) / b).cast("long")
    val s = col(scoreCol).cast("long")
    val mag = idiv(lit(500000L) * abs(s), lit(scale) + abs(s))
    val pMicro = lit(500000L) + when(s >= 0, mag).otherwise(-mag)
    val binned = scored.select(
      least(idiv(pMicro, lit(100000L)), lit(9L)).as("bin"),
      pMicro.as("__p"),
      col(truthCol).cast("long").as("__y"))
    val byBin = binned.groupBy("bin").agg(
      count(lit(1)).as("n"),
      sum("__y").as("n_pos"),
      sum("__p").as("sum_p_micro"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    byBin
      .withColumn("confidence",
        col("sum_p_micro").cast("double") /
          (col("n") * lit(1000000L)).cast("double"))
      .withColumn("accuracy",
        col("n_pos").cast("double") / col("n").cast("double"))
      .withColumn("ece",
        sum(abs(lit(1000000L) * col("n_pos") - col("sum_p_micro"))).over(wAll)
          .cast("double") /
          (sum(col("n")).over(wAll) * lit(1000000L)).cast("double"))
      .orderBy("bin")
  }

  /** PRECISION/RECALL curve of the classifier against a boolean truth —
    * the threshold-sweep companion to [[calibrationReport]]: one row per
    * OBSERVED probability bin, reading "if we admit everything scored at
    * or above this bin, here is the precision / recall / F1". The sweep
    * that picks a quality-filter operating point.
    *
    * Exactness: bin evidence is integer; tp/fp at each threshold are
    * DESCENDING prefix sums over the bin ladder (exact); precision,
    * recall, and F1 = 2tp/(2tp+fp+fn) are each ONE IEEE division of exact
    * integers. No float ever sums.
    *
    * Scale: one map-side-combined row-grain aggregate to ≤`bins` rows;
    * the sweep windows run on that ladder. */
  def prCurve(scored: DataFrame, scoreCol: String, truthCol: String,
              bins: Int = 64, scale: Long = 20000L): DataFrame = {
    require(1000000L % bins == 0, s"bins must divide 1e6, got $bins")
    def idiv(a: Column, b: Column): Column = ((a - pmod(a, b)) / b).cast("long")
    val s = col(scoreCol).cast("long")
    val mag = idiv(lit(500000L) * abs(s), lit(scale) + abs(s))
    val pMicro = lit(500000L) + when(s >= 0, mag).otherwise(-mag)
    val width = 1000000L / bins
    val byBin = scored.select(
        least(idiv(pMicro, lit(width)), lit(bins - 1L)).as("bin"),
        col(truthCol).cast("long").as("__y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("__y").as("n_pos"))
    val wDesc = org.apache.spark.sql.expressions.Window
      .orderBy(col("bin").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    byBin
      .withColumn("n_pred_pos", sum("n").over(wDesc))
      .withColumn("tp", sum("n_pos").over(wDesc))
      .withColumn("__total_pos", sum("n_pos").over(wAll))
      .select(col("bin"),
        (col("bin") * width).as("threshold_micro"),
        col("n"), col("n_pos"), col("n_pred_pos"), col("tp"),
        (col("tp").cast("double") / col("n_pred_pos").cast("double"))
          .as("precision"),
        when(col("__total_pos") === 0L, lit(null).cast("double"))
          .otherwise(col("tp").cast("double") / col("__total_pos").cast("double"))
          .as("recall"),
        ((lit(2L) * col("tp")).cast("double") /
          (lit(2L) * col("tp") + (col("n_pred_pos") - col("tp")) +
            (col("__total_pos") - col("tp"))).cast("double")).as("f1"))
      .orderBy("bin")
  }

  /** ISOTONIC calibration (the PAV fit) of the classifier's algebraic-
    * sigmoid probabilities against a boolean truth — the production
    * recalibration step when [[calibrationReport]] shows a miscalibrated
    * reliability diagram: the monotone-nondecreasing step function that
    * minimizes squared error to the empirical per-bin rates.
    *
    * No driver-side pool-adjacent-violators loop: the fit is computed in
    * its CLOSED minimax form, `fit(k) = max_{i≤k} min_{j≥k} rate(i..j)`
    * over pooled bin ranges — pure relational algebra (prefix sums +
    * two bounded non-equi joins + min/max), identical on any engine.
    * Determinism: bin evidence (`n`, `n_pos`, prefix sums) is exact
    * integer; every pooled rate is ONE IEEE division of exact integers;
    * min/max over doubles are order-free. No IEEE sum ever happens.
    *
    * Scale: the row-grain work is one map-side-combined aggregate to
    * ≤`bins` rows; everything after runs on that ladder (≤bins² pooled
    * ranges, ≤bins³ minimax triples — constants, independent of corpus
    * size; the non-equi joins are broadcast nested-loop over the tiny
    * frames BY CONSTRUCTION). */
  def isotonicCalibration(scored: DataFrame, scoreCol: String,
                          truthCol: String, bins: Int = 64,
                          scale: Long = 20000L): DataFrame = {
    require(1000000L % bins == 0, s"bins must divide 1e6, got $bins")
    def idiv(a: Column, b: Column): Column = ((a - pmod(a, b)) / b).cast("long")
    val s = col(scoreCol).cast("long")
    val mag = idiv(lit(500000L) * abs(s), lit(scale) + abs(s))
    val pMicro = lit(500000L) + when(s >= 0, mag).otherwise(-mag)
    val width = 1000000L / bins
    val byBin = scored.select(
        least(idiv(pMicro, lit(width)), lit(bins - 1L)).as("bin"),
        col(truthCol).cast("long").as("__y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("__y").as("n_pos"))
    // prefix sums over the OBSERVED-bin ladder (≤bins rows — the global
    // window is bounded by construction, like calibrationReport's ECE)
    val wPre = org.apache.spark.sql.expressions.Window.orderBy("bin")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val pre = byBin.select(col("bin"), col("n"), col("n_pos"),
      sum("n").over(wPre).as("__w1"), sum("n_pos").over(wPre).as("__p1"))
    val li = pre.select(col("bin").as("bi"),
      (col("__w1") - col("n")).as("__w0"), (col("__p1") - col("n_pos")).as("__p0"))
    val lj = pre.select(col("bin").as("bj"), col("__w1"), col("__p1"))
    // pooled rate of every contiguous bin range [bi..bj] — one exact division
    val ranges = li.join(lj, col("bj") >= col("bi"))
      .select(col("bi"), col("bj"),
        ((col("__p1") - col("__p0")).cast("double") /
          (col("__w1") - col("__w0")).cast("double")).as("__avg"))
    val ks = byBin.select(col("bin").as("k"))
    val fitted = ranges
      .join(ks, col("bi") <= col("k") && col("k") <= col("bj"))
      .groupBy("bi", "k").agg(min("__avg").as("__m")) // min over j ≥ k
      .groupBy("k").agg(max("__m").as("fitted"))      // max over i ≤ k
    byBin.join(fitted, col("bin") === col("k"))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("n_pos").cast("double") / col("n").cast("double")).as("rate"),
        col("fitted"))
      .orderBy("bin")
  }

  /** Preference-pair (DPO-style) mining — the alignment-data recipe:
    * within each prompt group, pair a high-scoring response (chosen)
    * against a low-scoring one (rejected) when the quality gap clears a
    * margin, keeping the `topPairs` widest-gap pairs per group with a
    * fully deterministic (gap desc, chosen id, rejected id) tiebreak. The
    * fixture stands in prompt ids with `doc_id mod groups`; a real corpus
    * passes its natural prompt key.
    *
    * Scale shape: the within-group self-join is CAPPED before it happens —
    * provably result-identical: a pair at rank ≤ topPairs under
    * (gap desc, chosen_id, rejected_id) must draw its chosen from the
    * group's topPairs docs by (score desc, doc_id) and its rejected from
    * the bottomPairs by (score asc, doc_id), because replacing a
    * non-top-P chosen with any of the ≥ P docs above it yields a pair with
    * a gap no smaller (and on a tie, an equal score and smaller chosen_id)
    * that sorts strictly earlier — so ≥ P pairs would outrank it. Both cap
    * windows and the rank window partition on the same group key (one
    * exchange, reused), and candidates per group are topPairs², NOT
    * responses-per-prompt² — the quadratic-per-group growth the round-8
    * probe flagged is gone even if a prompt key collides corpus-scale.
    * Scores are the integer classifier margins, so gaps and ordering are
    * exact on any engine; margin > 0 also keeps a doc from pairing with
    * itself (gap 0 never clears it). */
  def preferencePairs(docs: DataFrame, groups: Long = 200L,
                      margin: Long = 40L, topPairs: Int = 2,
                      nFeatures: Int = NFeatures): DataFrame = {
    require(margin > 0L, "margin must be positive (a zero margin would " +
      "admit self-pairs and ties with no quality gap)")
    val scored = scoreUnsorted(docs, nFeatures)
      .withColumn("grp", pmod(col("doc_id"), lit(groups)))
      .select("grp", "doc_id", "score")
    val wTop = org.apache.spark.sql.expressions.Window.partitionBy("grp")
      .orderBy(col("score").desc, col("doc_id"))
    val wBot = org.apache.spark.sql.expressions.Window.partitionBy("grp")
      .orderBy(col("score").asc, col("doc_id"))
    val ch = scored
      .withColumn("__r", row_number().over(wTop)).filter(col("__r") <= topPairs)
      .select(col("grp"), col("doc_id").as("chosen_id"),
        col("score").as("s_chosen"))
    val rj = scored
      .withColumn("__r", row_number().over(wBot)).filter(col("__r") <= topPairs)
      .select(col("grp").as("g2"), col("doc_id").as("rejected_id"),
        col("score").as("s_rejected"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("grp")
      .orderBy(col("gap").desc, col("chosen_id"), col("rejected_id"))
    ch.join(rj, col("grp") === col("g2") &&
        (col("s_chosen") - col("s_rejected")) >= margin)
      .withColumn("gap", col("s_chosen") - col("s_rejected"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= topPairs)
      .select("grp", "rk", "chosen_id", "rejected_id",
        "s_chosen", "s_rejected", "gap")
      .orderBy("grp", "rk")
  }

  /** K-fold LEAKAGE-FREE target encoding — the categorical-feature recipe
    * for training data: replace a category with the target mean computed
    * from the OTHER folds only (a row must never see its own label through
    * its feature — in-fold target means are the classic leakage bug that
    * inflates offline metrics and dies in production), smoothed toward the
    * out-of-fold global prior with pseudo-count weight `m` so rare
    * categories don't memorize their few labels:
    *
    *   enc(c, f) = (S_c − S_cf + m·prior_f) / (C_c − C_cf + m),
    *   prior_f   = (S − S_f) / (N − N_f)
    *
    * Exactness: everything is counts and integer target sums, so the
    * encoded value collapses to ONE division of exact decimals:
    *   ((S_c−S_cf)·(N−N_f) + m·(S−S_f)) / ((C_c−C_cf+m)·(N−N_f)).
    * A category present ONLY in fold f encodes to exactly the prior (the
    * numerator and denominator both reduce to m·(…)). Folds are assigned
    * by id modulus — deterministic, engine-portable, stable under
    * repartitioning.
    *
    * Scale shape: one row-grain map-side-combined aggregate to the
    * (category, fold) grain; the category / fold / global totals are
    * windows over that tiny grid (#cats · k rows), never re-touching the
    * row stream. Output = the encoding TABLE (broadcast-join it back to
    * the training rows — model-sized, like the PQ codebooks). */
  def targetEncode(df: DataFrame, catCol: String, idCol: String,
                   targetCol: Column, kFolds: Int = 5, m: Long = 20L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val base = df
      .filter(col(catCol).isNotNull && col(idCol).isNotNull)
      .groupBy(col(catCol).cast("string").as("category"),
        pmod(col(idCol), lit(kFolds.toLong)).as("fold"))
      .agg(count(lit(1)).as("n_cf"),
        sum(targetCol.cast("long")).cast("decimal(38,0)").as("s_cf"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val grid = base
      .withColumn("n_c", sum(col("n_cf")).over(w.partitionBy("category")))
      .withColumn("s_c", sum(col("s_cf")).over(w.partitionBy("category")))
      .withColumn("n_f", sum(col("n_cf")).over(w.partitionBy("fold")))
      .withColumn("s_f", sum(col("s_cf")).over(w.partitionBy("fold")))
      .withColumn("n_tot", sum(col("n_cf")).over(w.partitionBy()))
      .withColumn("s_tot", sum(col("s_cf")).over(w.partitionBy()))
    grid.select(
        col("category"), col("fold"),
        (col("n_c") - col("n_cf")).cast("long").as("n_oof"),
        (((dec(col("s_c")) - dec(col("s_cf"))) *
            dec(col("n_tot") - col("n_f")) +
          lit(m).cast("decimal(38,0)") * (dec(col("s_tot")) - dec(col("s_f"))))
          .cast("double") /
         ((dec(col("n_c")) - dec(col("n_cf")) + lit(m).cast("decimal(38,0)")) *
            dec(col("n_tot") - col("n_f"))).cast("double")).as("encoded"))
      .orderBy("category", "fold")
  }
}
