package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up of a fixture directory — the input generator for
  * the sf1 scale probe (SCALE.md's measured-vs-predicted table). The driver
  * ships fixtures up to sf0.1; this main replicates the tables a chosen
  * factor with key shifting so the result behaves like MORE data, not like
  * N copies:
  *
  *   - `lineitem`: replicas shift `l_orderkey` by a large stride — value
  *     distributions (the winsorize percentile workload) are unchanged.
  *   - `documents`: replicas shift `doc_id` AND deterministically permute
  *     each text's words (sort by `xxhash64(word, occurrence, replica)`): the word
  *     multiset — lengths, stopword/quality/language signals — is
  *     preserved, but shingles are destroyed, so replicas of a doc are NOT
  *     near-duplicates of each other and the dedup workload keeps its
  *     natural pair density instead of gaining C(factor,2) artificial dups
  *     per doc.
  *   - `embeddings`: replicas shift `vec_id`. Vector VALUES repeat (the
  *     k-means/encode cost under measurement scales with row count, not
  *     value diversity); query vectors stay `vec_id < 8`, i.e. replica 0.
  *   - every other table: copied through unchanged (dims stay dims). The
  *     output dir is sized for the probe queries, not the full suite.
  *
  * Usage: runMain graft.ScaleUp <srcDir> <dstDir> [factor=10] [mode=permute]
  *
  * `mode=perturb` additionally REPLACES ~1/5 of each replica's words with
  * (word, replica)-salted tokens. Purpose: constant-DUPLICATION-RATE
  * scaling for the blocking+verify lanes. Plain permutation preserves each
  * doc's word MULTISET, so the order-free fingerprints (simhash) of a
  * doc's `factor` replicas are IDENTICAL — every replica group is a
  * planted duplicate cluster whose pair output grows as factor^2 (the
  * round-5 probe measured exactly that on `q_dedup_editdist`:
  * fixture-output-bound 22x at 10x data). The (word, replica) salt at 1/5
  * pushes CROSS-replica docs ~40% of tokens apart — over every verify
  * threshold, order-free and order-sensitive alike — while leaving
  * WITHIN-replica pair structure exactly intact (shared words substitute
  * identically on both sides), i.e. the real-corpus regime where the
  * duplication rate does not grow with corpus size. */
object ScaleUp {

  private val Stride = 100000000L

  private def replicate(df: DataFrame, factor: Int): DataFrame =
    df.withColumn("__k", explode(sequence(lit(0L), lit(factor - 1L))))

  def main(args: Array[String]): Unit = {
    val (src, dst) = (args(0), args(1))
    val factor = if (args.length > 2) args(2).toInt else 10
    val mode = if (args.length > 3) args(3) else "permute"
    require(mode == "permute" || mode == "perturb", s"unknown mode $mode")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = replicate(spark.read.parquet(s"$src/lineitem.parquet"), factor)
      .withColumn("l_orderkey", col("l_orderkey") + col("__k") * Stride)
      .drop("__k")
    li.write.mode("overwrite").parquet(s"$dst/lineitem.parquet")

    val w = split(col("text"), " ")
    // perturb: salted substitution BEFORE the permutation sort. The SALT
    // key is (word, replica) — the SAME substitution corpus-wide within a
    // replica — which is the only keying that separates replicas without
    // collateral damage:
    //  - within-replica pair structure is EXACT: a planted near-dup pair's
    //    shared words substitute identically on both sides, so the pair's
    //    Jaccard/containment/edit distances are unchanged by the salt;
    //  - cross-replica distance is 2·saltRate of tokens (different salt
    //    sets per replica) — at 1/5 that is ~40% token edits, over every
    //    verify threshold (edit ratio 30%, Jaccard 0.5 — shingle-level
    //    divergence cubes: P(trigram clean both sides) = 0.64³ ≈ 0.26);
    //    a (doc, replica) salt key at 1/17 left replicas ~12% apart, which
    //    the ORDER-SENSITIVE edit lane accepted — 45 true pairs per base
    //    doc, output-bound quadratic at the decade (measured 81 s);
    //  - document-frequency-NEUTRAL: the salted token inherits exactly its
    //    word's own DF within the replica (no manufactured hot shingles);
    //  - token SHAPE preserved: the salt renders to ~6 chars (comparable
    //    to a word), so n_chars/length/quality signals barely move.
    val wordsIn =
      if (mode == "perturb")
        transform(w, x => when(pmod(xxhash64(x, col("__k")), lit(5L)) === 0,
          concat(lit("r"), col("__k").cast("string"), lit("x"),
            substring(abs(xxhash64(x, col("__k"))).cast("string"), 1, 4)))
          .otherwise(x))
      else w
    // The SORT key is (word, ARRAY POSITION, replica) — `transform`'s
    // (x, i) binds i to the token's position in the array, NOT a per-word
    // occurrence counter, so the "shared regions emit in the same relative
    // order" property holds only for POSITION-ALIGNED pairs: a planted
    // pair differing by an insertion/deletion shifts every subsequent
    // position and those two docs permute independently. That alignment
    // assumption is acceptable for fixture generation (the planted
    // word-swap pairs ARE position-aligned, and pair survival was measured
    // OK on the current fixtures — 768 pairs at 10x). Each key term is
    // load-bearing, and both failure modes were measured:
    //  - without the position index, every copy of a repeated word gets
    //    the same key and array_sort CLUMPS duplicates adjacent: every
    //    permuted doc emits degenerate "w w w" shingles for any word it
    //    repeats 3+ times. On the round-9 fixtures that manufactured
    //    trigrams with document frequency 12.6k/50k (base max DF 25) and
    //    blew the blocking lanes' candidate sets 218x at the decade
    //    (ProbeCandidates: 256 -> 55.9k pairs).
    //  - replica-level, NOT doc-level: a doc-level key reorders each
    //    planted near-dup pair's shared content differently, destroying
    //    the pair's shingle overlap — the corpus duplication RATE then
    //    falls ~10x at the decade (measured: flat 262 pairs) instead of
    //    staying roughly constant as the mode promises. With the shared
    //    key, position-aligned docs sharing a word-multiset region emit it
    //    in the same relative order, so planted pairs survive (measured:
    //    768 pairs at 10x); the position index keeps unrelated low-vocab
    //    docs from canonicalizing into one giant cluster (the round-6
    //    2.7M-pair failure was per-word keys with no position term).
    val permuted = concat_ws(" ", transform(
      array_sort(transform(wordsIn,
        (x, i) => struct(xxhash64(x, i, col("__k")).as("h"), x.as("w")))),
      s => s("w")))
    val docs = replicate(spark.read.parquet(s"$src/documents.parquet"), factor)
      .withColumn("doc_id", col("doc_id") + col("__k") * Stride)
      .withColumn("text", when(col("__k") === 0, col("text")).otherwise(permuted))
      .withColumn("n_chars", length(col("text")))
      .drop("__k")
    docs.write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val emb = replicate(spark.read.parquet(s"$src/embeddings.parquet"), factor)
      .withColumn("vec_id", col("vec_id") + col("__k") * Stride)
      .drop("__k")
    emb.write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    // orders replicates WITH lineitem's stride so the o_orderkey join keys
    // line up per replica — semantically "every customer places factor x
    // more orders" (custkey unchanged: the customer/supplier graph gains
    // edge multiplicity and density, the regime the graph/CF lanes see at
    // scale). Before round 6 orders passed through unscaled, which silently
    // reduced any orders⋈lineitem probe to replica 0.
    val ord = replicate(spark.read.parquet(s"$src/orders.parquet"), factor)
      .withColumn("o_orderkey", col("o_orderkey") + col("__k") * Stride)
      .drop("__k")
    ord.write.mode("overwrite").parquet(s"$dst/orders.parquet")

    // events: event_id shifts, user_id and ts stay — factor x busier users
    // on the same calendar (the event-analytics scaling regime). Reading
    // through Tables.events normalizes the TIMESTAMP(NANOS) quirk.
    val ev = replicate(graft.sources.Tables.events(spark, src), factor)
      .withColumn("event_id", col("event_id") + col("__k") * Stride)
      .drop("__k")
    ev.write.mode("overwrite").parquet(s"$dst/events.parquet")

    // dims copy as BYTES (nothing to scale)
    Seq("region", "nation", "customer", "supplier", "part")
      .foreach { t =>
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$src/$t.parquet"),
          java.nio.file.Paths.get(s"$dst/$t.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    println(s"""{"scaled":"$dst","factor":$factor}""")
    spark.stop()
  }
}
