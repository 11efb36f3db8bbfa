package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: print the ANALYZED expression trees of the HOF shapes the
  * round-9 rewrite rules must match (residual zip_with subtraction, long dot
  * product, cosine composition, minhash signature HOF). Not part of the
  * library surface; exists to pin matcher structure against real trees. */
object ProbeTrees {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0, 2.0), Seq(1L, 2L), Seq(3L, 4L),
      Seq("a", "b"))).toDF("f", "d", "la", "lb", "sh")

    // 1. residual subtraction (PqIndex shape)
    val sub = df.select(zip_with(col("f").cast("array<double>"), col("d"),
      (x, c) => x - c).as("r"))
    println("=== zip_with subtract ===")
    println(sub.queryExecution.analyzed.expressions.map(_.treeString).mkString)

    // 2. long dot product (sqTopK shape)
    val ldot = df.select(
      aggregate(zip_with(col("la"), col("lb"), (x, y) => x * y),
        lit(0L), (a, x) => a + x).as("s"))
    println("=== long dot ===")
    println(ldot.queryExecution.analyzed.expressions.map(_.treeString).mkString)

    // 3. cosine composition (after DotProductRewrite fires these are DotProduct)
    val cos = df.select(graft.operators.Similarity.cosineHof(col("f"), col("d")).as("c"))
    GraftExtensions.registerAll(spark)
    println("=== cosine composition (optimized) ===")
    println(cos.queryExecution.optimizedPlan.expressions.map(_.treeString).mkString)

    println("ansi=" + spark.conf.get("spark.sql.ansi.enabled"))
    try println("div0=" + spark.sql(
      "SELECT CAST(1.0 AS DOUBLE) / CAST(0.0 AS DOUBLE) AS d").head())
    catch { case e: Exception => println("div0 threw: " + e.getClass.getName) }
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cosNf = emb.select(graft.operators.Similarity.cosineHof(
      col("embedding"), col("embedding")).as("c"))
    println("=== cosine composition (withOptimized, non-collapsed) ===")
    println(spark.sessionState.optimizer.execute(
      cosNf.queryExecution.analyzed).expressions.map(_.treeString).mkString)

    // 4. minhash HOF
    val mh = df.select(graft.operators.NearDup.minhashSigHof(col("sh")).as("m"))
    println("=== minhash HOF ===")
    println(mh.queryExecution.analyzed.expressions.map(_.treeString).mkString)

    spark.stop()
  }
}
