package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13: how much of the four TF-IDF-family lanes is the shared
  * `tokens(documents)` build (tokenize + explode + (doc,tok) aggregate)?
  * Guide §1.1 measure-first for a candidate shared-state memo. */
object ProbeTfIdf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.registerAll(spark)
    import graft.sources.Tables
    def docs = Tables.documents(spark, sfDir)

    def tokensOf(d: DataFrame): DataFrame =
      d.select(col("doc_id"),
        explode(split(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")), " "))
          .as("tok"))
        .groupBy("doc_id", "tok")
        .agg(count(lit(1)).as("tf"))

    println(s"COUNT docs=${docs.count()} tok_rows=${tokensOf(docs).count()}")

    def timeIt(name: String)(mk: => DataFrame): Unit = {
      val ts = (1 to iters).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(s"probe:$name")
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name%-22s min ${ts.min}%6.3f  all ${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    timeIt("tokens_build") { tokensOf(docs) }
    timeIt("tfidf_topk") { graft.operators.TfIdf.topKSimilar(docs) }
    timeIt("bm25_topk") { graft.operators.TfIdf.bm25TopK(docs) }
    timeIt("keywords") { graft.operators.TfIdf.topTermsPerDoc(docs) }
    timeIt("hybrid_rrf") {
      graft.operators.Similarity.rrfFusion(docs, Tables.embeddings(spark, sfDir))
    }
    spark.stop()
  }
}
