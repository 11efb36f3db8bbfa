package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing decomposition of the q_kmv_sketch lane — where do
  * ~5 s at sf0.1 go for 215k grams? Each stage forces a noop write. */
object ProbeKmv {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    def time(tag: String)(f: => Unit): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[probe] $tag%-28s iter$i ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    }

    val docs = graft.sources.Tables.documents(spark, sfDir)
    def grams = docs.select(
      explode(graft.operators.TextAnalysis.wordGrams(col("text"), 8)).as("item"))

    time("explode grams")(grams.write.format("noop").mode("overwrite").save())
    time("grams + md5")(grams.select(md5(col("item")).as("h"))
      .write.format("noop").mode("overwrite").save())
    time("grams + md5 + conv") {
      grams.select(conv(substr(md5(col("item")), lit(1), lit(15)), 16, 10)
        .cast("long").as("h")).write.format("noop").mode("overwrite").save()
    }
    time("full kmvSketch") {
      graft.operators.Merge.kmvSketch(grams)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
