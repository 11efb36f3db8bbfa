package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM A/B of the round-10 operator-direct natives (TokenScore,
  * GopherStats, CdcBoundaries) against their portable HOF twins — no
  * rewrite rules here, so no pinning needed: the twin functions ARE the
  * off arms (`Classifier.scoreUnsortedHof`,
  * `ContentChunking.cdcBoundariesHof`, inline gopher HOF stats), kept in
  * the tree for exactly this purpose plus the parity specs. */
object ProbeTextScore {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.registerAll(spark)
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    val docs = graft.sources.Tables.documents(spark, sfDir).localCheckpoint()
    println(s"[probe] doc rows = ${docs.count()}")
    val toks = docs.select(
      split(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")), " ").as("w"))
      .localCheckpoint()
    toks.count()

    def time(tag: String, iters: Int = 3)(f: => Unit): Double = {
      var best = Double.MaxValue
      (1 to iters).foreach { i =>
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        best = math.min(best, dt)
        println(f"[probe] $tag%-28s iter$i $dt%6.2f s")
      }
      best
    }

    // ---- 1. token_score ----
    val s1 = time("score-hof") {
      graft.operators.Classifier.scoreUnsortedHof(docs)
        .agg(sum("score"), sum("n_feats")).collect()
    }
    val s2 = time("score-native") {
      graft.operators.Classifier.scoreUnsorted(docs)
        .agg(sum("score"), sum("n_feats")).collect()
    }
    val p1 = graft.operators.Classifier.scoreUnsortedHof(docs)
      .agg(sum("score")).collect()(0).get(0)
    val p2 = graft.operators.Classifier.scoreUnsorted(docs)
      .agg(sum("score")).collect()(0).get(0)
    require(p1 == p2, s"token_score parity broke: $p1 vs $p2")
    println(f"[probe] RESULT token_score hof=$s1%.2f s native=$s2%.2f s speedup=${s1 / s2}%.2fx")

    // ---- 2. gopher_stats ----
    def gopherHof(df: DataFrame) = df.select(
      aggregate(col("w"), lit(0L), (acc, x) => acc + length(x)).as("len"),
      size(filter(col("w"), x => x.rlike("[a-z]"))).cast("long").as("na"),
      coalesce(array_max(transform(array_distinct(col("w")),
        x => size(filter(col("w"), y => y === x)))).cast("long"), lit(0L)).as("tf"))
    def gopherNat(df: DataFrame) = df.select(
      graft.functions.TextScoreFunctions.gopher_stats(col("w")).as("g"))
      .select(col("g.total_len").as("len"), col("g.n_alpha").as("na"),
        coalesce(col("g.max_tf"), lit(0L)).as("tf"))
    val g1 = time("gopher-hof") {
      gopherHof(toks).agg(sum("len"), sum("na"), sum("tf")).collect()
    }
    val g2 = time("gopher-native") {
      gopherNat(toks).agg(sum("len"), sum("na"), sum("tf")).collect()
    }
    val gp1 = gopherHof(toks).agg(sum("len"), sum("na"), sum("tf")).collect()(0)
    val gp2 = gopherNat(toks).agg(sum("len"), sum("na"), sum("tf")).collect()(0)
    require(gp1 == gp2, s"gopher_stats parity broke: $gp1 vs $gp2")
    println(f"[probe] RESULT gopher_stats hof=$g1%.2f s native=$g2%.2f s speedup=${g1 / g2}%.2fx")

    // ---- 3. cdc_boundaries ----
    val c1 = time("cdc-hof") {
      toks.select(graft.operators.ContentChunking
        .cdcBoundariesHof(col("w"), size(col("w")), 4, 16).as("b"))
        .agg(sum(size(col("b")))).collect()
    }
    val c2 = time("cdc-native") {
      toks.select(graft.functions.TextScoreFunctions
        .cdc_boundaries(col("w"), 4, 16).as("b"))
        .agg(sum(size(col("b")))).collect()
    }
    val cp1 = toks.select(graft.operators.ContentChunking
      .cdcBoundariesHof(col("w"), size(col("w")), 4, 16).as("b"))
      .agg(sum(aggregate(col("b"), lit(0L), (a, x) => a + x))).collect()(0).get(0)
    val cp2 = toks.select(graft.functions.TextScoreFunctions
      .cdc_boundaries(col("w"), 4, 16).as("b"))
      .agg(sum(aggregate(col("b"), lit(0L), (a, x) => a + x))).collect()(0).get(0)
    require(cp1 == cp2, s"cdc_boundaries parity broke: $cp1 vs $cp2")
    println(f"[probe] RESULT cdc_boundaries hof=$c1%.2f s native=$c2%.2f s speedup=${c1 / c2}%.2fx")

    spark.stop()
  }
}
