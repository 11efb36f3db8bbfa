package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM A/B of the interpreted HOF dot product vs the
  * [[graft.plans.DotProductRewrite]] native expression — back-to-back in one
  * session, so cross-day ambient drift can't fake (or hide) the effect.
  *
  * The "rewrite OFF" arm is pinned WITHOUT touching session state: its zero
  * literal is −0.0, which the rule deliberately refuses (empty-array folds
  * would flip sign) but which is value-identical on the fixture's non-empty
  * vectors (−0.0 + x == x bit-for-bit). Both arms therefore run the same
  * plan shape over the same scan; only the projection expression differs.
  */
object ProbeDotRewrite {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicate = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPL", "16").toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.registerAll(spark)
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    // replicate the embedding corpus so per-row cost dominates scan setup
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
      .crossJoin(spark.range(replicate).select(col("id").as("rep")))
      .select(col("embedding")).localCheckpoint()
    val n = emb.count()
    println(s"[probe] rows = $n (replicate x$replicate)")

    def hofPinned(a: Column, b: Column): Column = // -0.0 zero: NOT rewritten
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(-0.0), (acc, x) => acc + x)
    def hofRewritten(a: Column, b: Column): Column = // +0.0 zero: rewritten
      graft.operators.Similarity.dot(a, b)

    def run(tag: String, expr: Column): Double = {
      var best = Double.MaxValue
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        emb.select(sum(expr).as("s")).collect()
        val dt = (System.nanoTime() - t0) / 1e9
        best = math.min(best, dt)
        println(f"[probe] $tag%-22s iter$i $dt%6.2f s")
      }
      best
    }
    // interleave arms to even out any slow JIT ramp
    val e = col("embedding")
    val a1 = run("hof-interpreted", hofPinned(e, e))
    val b1 = run("native-rewritten", hofRewritten(e, e))
    // value parity on this corpus (non-empty vectors): sums must be equal bits
    val va = emb.select(sum(hofPinned(e, e))).collect()(0).getDouble(0)
    val vb = emb.select(sum(hofRewritten(e, e))).collect()(0).getDouble(0)
    require(java.lang.Double.doubleToRawLongBits(va) ==
      java.lang.Double.doubleToRawLongBits(vb), s"parity broke: $va vs $vb")
    println(f"[probe] RESULT hof=$a1%.2f s native=$b1%.2f s speedup=${a1 / b1}%.2fx (sums bit-equal)")
    spark.stop()
  }
}
