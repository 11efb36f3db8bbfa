package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for LLM-data curation: MinHash+LSH, SimHash, and
  * n-gram Jaccard verification (north star scope; FIXTURES.md documents the
  * planted near-dup pairs in the `documents` fixture).
  *
  * Design for 100 TB:
  *   - signatures are computed per-row with codegen'd higher-order functions —
  *     a narrow map over the scan, no UDF, no shuffle, no driver involvement;
  *   - candidate generation shuffles only (band_key -> doc_id) pairs — the
  *     classic LSH bucket join; band keys are md5'd so bucket hashing is
  *     uniform; the full text never shuffles;
  *   - exact Jaccard verification touches only the candidate pairs (bounded
  *     by LSH collision count), never the n^2 pair space.
  */
object NearDup {

  val NumHashes = 16 // minhash signature length
  val NumBands = 4   // LSH bands (rows per band = 16/4 = 4)

  /** Normalized character n-gram shingle set, entirely in codegen'd
    * expressions: lower -> collapse non-alnum -> sliding substrings ->
    * distinct. */
  def shingles(text: Column, n: Int = 5): Column = {
    val norm = trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))
    array_distinct(transform(
      sequence(lit(1), greatest(length(norm) - (n - 1), lit(1))),
      i => substr(norm, i, lit(n))))
  }

  /** MinHash signature: for seed s, sig[s] = min over shingles of
    * md5(s || "_" || shingle). Lexicographic min over a uniform hash is a
    * valid min-wise hash; strings keep it portable across engines. */
  def minhashSig(sh: Column): Column =
    transform(sequence(lit(0), lit(NumHashes - 1)),
      s => array_min(transform(sh, x => md5(concat(s.cast("string"), lit("_"), x)))))

  /** doc_id + shingle set + minhash signature. */
  def signatures(docs: DataFrame, n: Int = 5): DataFrame = {
    val sh = shingles(col("text"), n)
    docs.select(col("doc_id"), sh.as("sh"))
      .withColumn("sig", minhashSig(col("sh")))
  }

  /** LSH banding: band key b = md5(join(sig[b*r+1 .. b*r+r])); docs sharing
    * any band key become candidate pairs. One shuffle on (band, key). */
  def lshCandidates(sigs: DataFrame): DataFrame = {
    val r = NumHashes / NumBands
    val bands = transform(sequence(lit(0), lit(NumBands - 1)),
      b => struct(b.as("band"),
        md5(concat_ws("|", slice(col("sig"), b * r + 1, lit(r)))).as("key")))
    val exploded = sigs
      .select(col("doc_id"), explode(bands).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val a = exploded.alias("a")
    val b = exploded.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
              col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
  }

  /** Exact n-gram Jaccard for a set of (a_id, b_id) candidate pairs: join the
    * shingle sets back (broadcast-sized at candidate cardinality) and compute
    * |A∩B| / |A∪B| with portable membership-count semantics. */
  def jaccardVerify(pairs: DataFrame, sigs: DataFrame): DataFrame = {
    val aSets = sigs.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
    val bSets = sigs.select(col("doc_id").as("b_id"), col("sh").as("b_sh"))
    pairs.join(aSets, "a_id").join(bSets, "b_id")
      .withColumn("inter",
        size(filter(col("a_sh"), x => array_contains(col("b_sh"), x))).cast("long"))
      .withColumn("uni",
        (size(col("a_sh")) + size(col("b_sh"))).cast("long") - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni").cast("double"))
      .select("a_id", "b_id", "inter", "uni", "jaccard")
  }

  /** End-to-end MinHash/LSH near-dup pairs above a Jaccard threshold. */
  def minhashPairs(docs: DataFrame, threshold: Double = 0.5, n: Int = 5): DataFrame = {
    val sigs = signatures(docs, n)
    jaccardVerify(lshCandidates(sigs), sigs)
      .filter(col("jaccard") >= threshold)
      .orderBy("a_id", "b_id")
  }

  /** Brute-force n-gram Jaccard similarity join (the verification oracle for
    * LSH recall): explode distinct shingles, join on shingle, count per pair.
    * This is the standard token-join set-similarity formulation — at 100 TB
    * you bound it with prefix filtering; here it doubles as the exact answer
    * to measure LSH recall against. */
  def jaccardJoin(docs: DataFrame, threshold: Double = 0.5, n: Int = 5): DataFrame = {
    val sigs = signatures(docs, n).select("doc_id", "sh")
    val tokens = sigs.select(col("doc_id"), explode(col("sh")).as("tok"))
    val counts = sigs.select(col("doc_id"), size(col("sh")).as("n_sh"))
    val aT = tokens.select(col("doc_id").as("a_id"), col("tok"))
    val bT = tokens.select(col("doc_id").as("b_id"), col("tok"))
    val inter = aT.join(bT, Seq("tok")).filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
    inter
      .join(counts.select(col("doc_id").as("a_id"), col("n_sh").as("na")), "a_id")
      .join(counts.select(col("doc_id").as("b_id"), col("n_sh").as("nb")), "b_id")
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
      .orderBy("a_id", "b_id")
  }

  /** 32-bit SimHash over word tokens: token hash = first 8 md5 hex chars as
    * int; bit j of the fingerprint is the majority vote of token bits.
    * Nested higher-order aggregates — still pure codegen'd expressions. */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = split(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")), " ")
    val th = transform(toks,
      t => conv(substr(md5(t), lit(1), lit(8)), 16, 10).cast("long"))
    val nTok = size(th).cast("long")
    val fp = aggregate(sequence(lit(0), lit(31)), lit(0L),
      (acc, j) => {
        val ones = aggregate(th, lit(0L),
          (a, h) => a + call_function("getbit", h, j.cast("int")).cast("long"))
        // 2^j is exact in a double for j <= 31, so pow() is a safe dynamic shift
        acc + when(ones * 2 > nTok, pow(lit(2.0), j).cast("long")).otherwise(0L)
      })
    docs.select(col("doc_id"), fp.as("simhash"))
  }

  /** SimHash near-dup pairs: block on 16-bit halves (a pair within Hamming
    * distance d collides on at least one half when d <= 16... pigeonhole with
    * 2 blocks guarantees d <= 1 per-half-exact; wider d trades recall), then
    * verify Hamming distance via bit_count(xor). */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    val fps = simhash(docs)
    val blocked = fps.select(col("doc_id"), col("simhash"),
        explode(array(
          struct(lit(0).as("blk"), col("simhash").bitwiseAND(65535L).as("key")),
          struct(lit(1).as("blk"), shiftright(col("simhash"), 16).as("key"))
        )).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.blk").as("blk"), col("b.key").as("key"))
    val a = blocked.alias("a")
    val b = blocked.alias("b")
    a.join(b, col("a.blk") === col("b.blk") && col("a.key") === col("b.key") &&
              col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
      .orderBy("a_id", "b_id")
  }
}
