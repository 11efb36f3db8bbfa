package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Candidate-volume probe for the blocking-sensitive dedup lanes — the
  * denominator behind their sf1 exponents. Blocking cost is CANDIDATE-bound,
  * and candidates are a property of the CORPUS (shingle document-frequency
  * distribution), not of the operator: this prints the counts that explain a
  * decade probe's blocking-lane ratios on whatever fixture generation the
  * driver shipped that round. */
object ProbeCandidates {
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
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val sigs = NearDup.signatures(docs).localCheckpoint(false)
    println(s"[cand] docs = ${docs.count()}")
    val lsh = NearDup.lshCandidates(sigs).count()
    println(s"[cand] lsh_candidate_pairs = $lsh")
    val hotShingle = sigs.select(explode(col("sh")).as("t"))
      .groupBy("t").count().agg(max("count")).collect()(0).getLong(0)
    println(s"[cand] max_shingle_df = $hotShingle")
    println(s"[cand] done")
    spark.stop()
  }
}
