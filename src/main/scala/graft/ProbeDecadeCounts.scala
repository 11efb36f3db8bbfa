package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade instrumentation for the sf1-heaviest honest lanes (round-13
  * verdict task): BEFORE touching q_dedup_editdist / q_triangle_count /
  * q_dedup_jaccard / q_attribution, record the counts their costs are
  * actually bound by — candidate pairs, wedges, band selectivities,
  * interval-join output — at sf0.1 vs sf1. A rewrite is only worth
  * chasing if the BOUND grows slower than the lane's measured time; if
  * the counts themselves carry the exponent, the lane is output-bound
  * and honest. Run once per corpus dir:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ProbeDecadeCounts"
  */
object ProbeDecadeCounts {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.registerAll(spark)
    import graft.operators.NearDup
    println(s"[decade] dir = $sfDir")

    // ---- q_dedup_editdist: blocking-candidate + verified-pair volume ----
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val nDocs = docs.count()
    println(s"[decade] docs = $nDocs")
    val edCand = NearDup.lenBucketedSimhashPairs(docs, 8, 30).count()
    println(s"[decade] editdist_block_candidates = $edCand")
    val edPairs = NearDup.editDistancePairs(docs).count()
    println(s"[decade] editdist_verified_pairs = $edPairs")

    // ---- q_dedup_jaccard: prefix-filter candidates + verified pairs ----
    val sigs = NearDup.signatures(docs).select("doc_id", "sh")
      .localCheckpoint(false)
    val jacCand = NearDup.candidatesForProfiling(sigs, 0.5).count()
    println(s"[decade] jaccard_prefix_candidates = $jacCand")
    val jacPairs = NearDup.jaccardJoin(docs, 0.5).count()
    println(s"[decade] jaccard_verified_pairs = $jacPairs")

    // ---- q_triangle_count: edge/wedge/triangle census + the ORIENTED
    // wedge count (the join's actual output volume — the report's
    // n_wedges is the larger unoriented total) ----
    // the edge DERIVATION's quadratic bound: basket pair expansion volume
    // (sum over orders of C(#distinct parts, 2)) — at sf0.1 the census
    // numbers below are trivial, so if the lane's decade cost lives
    // anywhere, it lives here
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val expandedPairs = li.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n"))
      .agg(sum(expr("n * (n - 1L) DIV 2L"))).collect()(0).getLong(0)
    println(s"[decade] tri_expanded_basket_pairs = $expandedPairs")
    val edges = SparkEntry.coPurchaseEdges(spark, sfDir)
    val stats = graft.operators.Graph
      .triangleStats(edges, "item_a", "item_b").collect()(0)
    println(s"[decade] tri_nodes = ${stats.getAs[Long]("n_nodes")} " +
      s"edges = ${stats.getAs[Long]("n_edges")} " +
      s"wedges = ${stats.getAs[Long]("n_wedges")} " +
      s"triangles = ${stats.getAs[Long]("n_triangles")}")
    val canon = edges.select(
        least(col("item_a"), col("item_b")).as("a"),
        greatest(col("item_a"), col("item_b")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val sym = canon.unionAll(canon.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy("a").agg(count(lit(1)).as("deg"))
    val orientedWedges = canon
      .join(deg.select(col("a"), col("deg").as("deg_a")), "a")
      .join(deg.select(col("a").as("b"), col("deg").as("deg_b")), "b")
      .select(when(col("deg_a") < col("deg_b") ||
          (col("deg_a") === col("deg_b") && col("a") < col("b")),
          col("a")).otherwise(col("b")).as("src"))
      .groupBy("src").agg(count(lit(1)).as("d"))
      .agg(sum(expr("d * (d - 1L) DIV 2L"))).collect()(0).getLong(0)
    println(s"[decade] tri_oriented_wedges = $orientedWedges")

    // ---- q_attribution: interval-join input/output volume ----
    val events = graft.sources.Tables.events(spark, sfDir)
    val clicks = events.filter(col("event_type") === "click").count()
    val views = events.filter(col("event_type") === "view").count()
    val pairs = graft.streaming.StreamingOps
      .attributionJoin(events).count()
    println(s"[decade] attribution_clicks = $clicks views = $views " +
      s"pairs = $pairs")

    // ---- round-14: the next sf1 tier (verdict task 6) ----
    // q_rec_eval / q_cf_similarity: the CF pair build's volumes — exploded
    // within-basket pairs (the quadratic term), distinct pairs, and minCo
    // survivors. The eval lane pays this on its TRAIN split, the
    // similarity owner on the full basket relation.
    val orders = graft.sources.Tables.orders(spark, sfDir)
    val baskets = orders.select(col("o_orderkey"), col("o_custkey"))
      .join(graft.sources.Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"), col("l_suppkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
    val nBasketRows = baskets.count()
    val bD = baskets.distinct()
    val nBasketDistinct = bD.count()
    val cfExpanded = bD.groupBy("cust").agg(count(lit(1)).as("n"))
      .agg(sum(expr("n * (n - 1L) DIV 2L"))).collect()(0).getLong(0)
    val cfDistinctPairs = graft.operators.Graph
      .coOccurrenceEdges(baskets, "cust", "supp", minCo = 1).count()
    val cfSurvivors = graft.operators.Graph
      .coOccurrenceEdges(baskets, "cust", "supp", minCo = 2).count()
    println(s"[decade] cf_basket_rows = $nBasketRows distinct = " +
      s"$nBasketDistinct expanded_pairs = $cfExpanded distinct_pairs = " +
      s"$cfDistinctPairs minco2_pairs = $cfSurvivors")

    // q_vec_pq: training scans n·dim decimals per Lloyd iteration and the
    // encode emits one M-code row per vector — both row-linear; record n
    // and dim so the decade exponent's carrier is explicit.
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val nEmb = emb.count()
    val dim = emb.select(size(col("embedding")).as("d")).agg(max(col("d")))
      .collect()(0).getInt(0)
    println(s"[decade] pq_vectors = $nEmb dim = $dim")

    println("[decade] done")
    spark.stop()
  }
}
