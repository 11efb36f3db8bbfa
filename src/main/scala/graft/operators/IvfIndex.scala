package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the clustered
  * alternative to the random-hyperplane LSH path in [[Similarity]]:
  *
  *   index build: deterministic seed partition (vec_id % nLists) -> centroid
  *   means -> one Lloyd refinement step -> final inverted lists;
  *   query: rank centroids per query, probe the nProbe nearest lists, exact
  *   cosine top-k over only those lists' members.
  *
  * Scale shape: the build is two passes over the exploded (vec, dim, val)
  * table — the honest IVF training cost, all shuffles keyed on (list, dim);
  * a query then touches ~nProbe/nLists of the corpus instead of all of it.
  *
  * Determinism engineering (oracle-enforced): centroid means use
  * DECIMAL-exact component sums; squared-distance terms are DECIMAL-cast
  * per-term then exactly summed, so argmin assignments and probe rankings are
  * identical across engines and partitionings — k-means with double
  * accumulators would NOT be (partial-sum order changes assignments).
  */
object IvfIndex {

  private def exploded(emb: DataFrame, id: String): DataFrame =
    emb.select(col(id), posexplode(col("embedding")).as(Seq("dim", "v")))
      .withColumn("v", col("v").cast("double"))

  /** (list, dim, c) centroids from an assignment (vec_id -> list). */
  private def centroids(ve: DataFrame, assign: DataFrame): DataFrame =
    ve.join(assign, "vec_id")
      .groupBy("list", "dim")
      .agg((sum(col("v").cast("decimal(28,12)")).cast("double") /
            count(lit(1))).as("c"))

  /** DECIMAL-exact squared distance of every vector to every centroid:
    * (vec_id, list, dist2). */
  private def dist2(ve: DataFrame, cents: DataFrame): DataFrame =
    ve.join(cents, "dim")
      .withColumn("term", ((col("v") - col("c")) * (col("v") - col("c")))
        .cast("decimal(38,18)"))
      .groupBy("vec_id", "list")
      .agg(sum("term").as("dist2"))

  private def argmin(d: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(col("dist2").asc, col("list").asc)
    d.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("vec_id", "list")
  }

  /** Final inverted-list assignment after seed + one Lloyd step. */
  def assignments(emb: DataFrame, nLists: Int = 8): DataFrame = {
    val ve = exploded(emb, "vec_id")
    val seed = emb.select(col("vec_id"),
      pmod(col("vec_id"), lit(nLists.toLong)).as("list"))
    val c0 = centroids(ve, seed)
    val a1 = argmin(dist2(ve, c0))
    val c1 = centroids(ve, a1)
    argmin(dist2(ve, c1))
  }

  /** IVF top-k: probe the nProbe nearest lists per query, exact cosine
    * re-rank within them. */
  def topK(emb: DataFrame, nQueries: Int = 8, k: Int = 5,
           nLists: Int = 8, nProbe: Int = 2): DataFrame = {
    val ve = exploded(emb, "vec_id")
    val seed = emb.select(col("vec_id"),
      pmod(col("vec_id"), lit(nLists.toLong)).as("list"))
    val c0 = centroids(ve, seed)
    val a1 = argmin(dist2(ve, c0))
    val finalCents = centroids(ve, a1)
    val finalAssign = argmin(dist2(ve, finalCents))

    val qd = dist2(ve.filter(col("vec_id") < nQueries), finalCents)
    val wProbe = Window.partitionBy("vec_id").orderBy(col("dist2").asc, col("list").asc)
    val probes = qd.withColumn("__rn", row_number().over(wProbe))
      .filter(col("__rn") <= nProbe)
      .select(col("vec_id").as("q_id"), col("list"))

    val members = finalAssign.select(col("vec_id").as("n_id"), col("list"))
    val qEmb = emb.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .filter(col("q_id") < nQueries)
    val nEmb = emb.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))

    val cand = probes.join(members, "list")
      .filter(col("q_id") =!= col("n_id"))
      .select("q_id", "n_id").distinct()
      .join(broadcast(qEmb), "q_id")
      .join(nEmb, "n_id")
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    cand.withColumn("cos", Similarity.cosine(col("q_emb"), col("n_emb")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("q_id", "rk", "n_id", "cos")
      .orderBy("q_id", "rk")
  }
}
