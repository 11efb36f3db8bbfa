package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Product quantization (PQ) — the vector-compression half of IVF-PQ, the
  * standard storage format for billion-scale ANN: the 64-d embedding splits
  * into `M` = 8 subspaces of 8 dims, each subspace gets its own `K` = 16
  * codebook trained by k-means, and a vector is stored as 8 nibble codes
  * (4 bytes) instead of 64 floats (256 bytes) — a 64x compression that turns
  * 100 TB of embeddings into ~1.6 TB of codes that fit in cluster memory.
  *
  * Training mirrors [[IvfIndex]]'s determinism engineering exactly, per
  * subspace: deterministic seed partition (vec_id % K) -> DECIMAL-exact
  * centroid means -> Lloyd refinement with DECIMAL-exact squared distances
  * ([[graft.functions.SquaredDistances]] on the subvector slice), so code
  * assignments are identical across engines and partitionings. Codebook
  * state is O(M x K x subDim) — driver-collected per Lloyd step like any
  * distributed k-means; corpus scanned once per iteration.
  *
  * Encoding is a pure narrow map: per vector, M fused distance kernels over
  * broadcast codebook literals + argmin — no join, no shuffle, no explode.
  */
object PqIndex {

  val M = 8       // subspaces
  val SubDim = 8  // dims per subspace (M * SubDim = embedding dim)
  val K = 16      // codes per subspace (one nibble)

  /** (vec_id, s, subdim, v) — subspace-tagged exploded components. */
  private def exploded(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("vec_id"),
        expr(s"cast(dim div $SubDim as int)").as("s"),
        pmod(col("dim"), lit(SubDim)).cast("int").as("subdim"),
        col("v").cast("double").as("v"))

  /** Per-(subspace, code) centroid means from an assignment (vec_id, s, code),
    * DECIMAL-exact like [[IvfIndex]]. */
  private def centroids(ve: DataFrame, assign: DataFrame): DataFrame =
    ve.join(assign, Seq("vec_id", "s"))
      .groupBy("s", "code", "subdim")
      .agg((sum(col("v").cast("decimal(28,12)")).cast("double") /
            count(lit(1))).as("c"))

  /** Collect the (M x K x SubDim — tiny) codebook into per-subspace packed
    * (matrix, codeIds) literals; a code emptied by a Lloyd step drops out,
    * so positions map back through codeIds. */
  private def collectCodebooks(cents: DataFrame): Seq[(Column, Column)] = {
    val rows = cents.select("s", "code", "subdim", "c").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    (0 until M).map { s =>
      val byCode = rows.filter(_._1 == s).groupBy(_._2).toSeq.sortBy(_._1)
      val codeIds = byCode.map(_._1)
      val matrix = byCode.map(_._2.sortBy(_._3).map(_._4).toSeq)
      (typedLit(matrix), typedLit(codeIds))
    }
  }

  /** Per-subspace nearest-code expressions: fused decimal-exact distances
    * over the subvector slice, argmin with first-position (= smallest code,
    * codeIds being sorted) tie-break. */
  private def codeExprs(packed: Seq[(Column, Column)]): Seq[Column] =
    (0 until M).map { s =>
      val ds = VectorFunctions.squared_distances(
        slice(col("embedding"), s * SubDim + 1, SubDim), packed(s)._1)
      element_at(packed(s)._2, array_position(ds, array_min(ds)).cast("int"))
    }

  /** (vec_id, s, code) assignment rows under the given codebooks. */
  private def assignRows(emb: DataFrame, packed: Seq[(Column, Column)]): DataFrame =
    emb.select(col("vec_id"),
      posexplode(array(codeExprs(packed): _*)).as(Seq("s", "code")))

  /** Seed partition + `nIters` Lloyd refinements per subspace; returns the
    * packed per-subspace codebook literals. Callers pass an already
    * compute-partitioned frame ([[graft.core.Parallelism.forCompute]]) — a
    * small parquet file arrives as ONE split, which would serialize the
    * explode + fused distance kernels onto a single core. */
  private[operators] def train(emb: DataFrame, nIters: Int): Seq[(Column, Column)] = {
    val ve = exploded(emb)
    val seed = emb
      .select(col("vec_id"), explode(sequence(lit(0), lit(M - 1))).as("s"))
      .withColumn("code", pmod(col("vec_id"), lit(K.toLong)))
    var packed = collectCodebooks(centroids(ve, seed))
    (1 to nIters).foreach { _ =>
      packed = collectCodebooks(centroids(ve, assignRows(emb, packed)))
    }
    packed
  }

  /** PQ-encode every vector: seed partition + `nIters` Lloyd refinements per
    * subspace, then one narrow encoding pass. Output: `code_0..code_{M-1}`
    * (each in [0, K)) plus the nibble-packed `pq_code` — the 4-byte storage
    * form. */
  def codes(emb: DataFrame, nIters: Int = 1): DataFrame = {
    val e = graft.core.Parallelism.forCompute(emb)
    val packed = train(e, nIters)
    val cs = codeExprs(packed).zipWithIndex
      .map { case (c, s) => c.cast("long").as(s"code_$s") }
    e.select(col("vec_id") +: cs: _*)
      .withColumn("pq_code",
        (0 until M).map(s => shiftleft(col(s"code_$s"), 4 * s)).reduce(_ + _))
      .orderBy("vec_id")
  }

  /** Test-only probe: (s, code_of_nId, lut_dist2_string) per subspace for
    * one (query, neighbor) pair — used to localize cross-engine decimal
    * drift. */
  private[operators] def debugTerms(emb: DataFrame, qId: Long,
                                    nId: Long): Seq[(Int, Long, String)] = {
    val packed = train(emb, 1)
    val cs = codeExprs(packed).zipWithIndex
      .map { case (c, s) => c.cast("long").as(s"code_$s") }
    val codes = emb.filter(col("vec_id") === nId)
      .select(col("vec_id") +: cs: _*).collect()(0)
    (0 until M).map { s =>
      val code = codes.getAs[Long](s"code_$s")
      val lut = emb.filter(col("vec_id") === qId).select(
        element_at(
          VectorFunctions.squared_distances(
            slice(col("embedding"), s * SubDim + 1, SubDim), packed(s)._1),
          array_position(packed(s)._2, lit(code)).cast("int"))
          .cast("string")).collect()(0).getString(0)
      (s, code, lut)
    }
  }

  /** ADC (asymmetric distance computation) top-k — how PQ is actually
    * SEARCHED: the query stays a full-precision vector, every corpus vector
    * is only its 8 codes, and distance is the sum of per-subspace
    * lookup-table entries dist2(query_subvec, codebook[code]).
    *
    * Scale shape: each query precomputes its M x K lookup table ONCE (one
    * fused-kernel pass over the codebook literals — M*K*SubDim flops), the
    * tiny (q_id, luts) table BROADCASTS, and scoring the corpus is a pure
    * narrow map over the 4-byte codes — the full embeddings are never read
    * at query time, which is the entire point of PQ at 100 TB. Distances
    * are decimal-exact sums of decimal-exact table entries, so ranking is
    * engine-identical and the oracle mirrors it from the shared CTE chain. */
  def adcTopK(emb: DataFrame, nQueries: Int = 8, k: Int = 5,
              nIters: Int = 1): DataFrame = {
    val e = graft.core.Parallelism.forCompute(emb)
    val packed = train(e, nIters)
    val cs = codeExprs(packed).zipWithIndex
      .map { case (c, s) => c.cast("long").as(s"code_$s") }
    val corpus = e.select(col("vec_id").as("n_id") +: cs: _*)
    val luts = array((0 until M).map { s =>
      VectorFunctions.squared_distances(
        slice(col("embedding"), s * SubDim + 1, SubDim), packed(s)._1)
    }: _*)
    val queries = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), luts.as("luts"))
    // each term re-cast to decimal(30,18): adding two decimal(38,18)s caps
    // precision at 38 and SHEDS A SCALE DIGIT per addition (8 terms would
    // round to scale 11); (30,18) terms grow to at most (37,18) — exact
    val adist = (0 until M).map { s =>
      element_at(element_at(col("luts"), s + 1),
        array_position(packed(s)._2, col(s"code_$s")).cast("int"))
        .cast("decimal(30,18)")
    }.reduce(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("adist").asc, col("n_id").asc)
    // adist surfaces as its exact decimal STRING: decimal->double conversion
    // is differently rounded across engines at the 17th significant digit
    // (Java BigDecimal.doubleValue vs DuckDB's int128/10^18 lane), while the
    // decimal value itself is bit-identical
    corpus.join(broadcast(queries), col("q_id") =!= col("n_id"))
      .withColumn("adist", adist)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("n_id"),
        col("adist").cast("string").as("adist"))
      .orderBy("q_id", "rk")
  }
}
