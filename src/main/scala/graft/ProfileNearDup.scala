package graft

import org.apache.spark.sql.SparkSession

import graft.operators.NearDup
import graft.sources.Tables

/** Dev tool: stage-by-stage timing of the near-dup pipeline at a given SF.
  * Run: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.ProfileNearDup"` */
object ProfileNearDup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = Tables.documents(spark, sfDir)
    time("warmup")(noop(spark.range(1000).selectExpr("sum(id) s")))
    time("shingles only")(noop(docs.select(NearDup.shingles(
      org.apache.spark.sql.functions.col("text")).as("sh"))))
    time("signatures")(noop(NearDup.signatures(docs)))
    val sigs = NearDup.signatures(docs)
    time("lshCandidates")(noop(NearDup.lshCandidates(sigs)))
    time("verify (minhash full)")(noop(NearDup.minhashPairs(docs, 0.5)))
    time("jaccardJoin full")(noop(NearDup.jaccardJoin(docs, 0.5)))
    println("lsh candidate pairs: " + NearDup.lshCandidates(sigs).count())
    // internal split of jaccardJoin: candidate generation vs verification
    locally {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val sigs2 = NearDup.signatures(docs).select("doc_id", "sh")
      val tokens = sigs2.select(col("doc_id"), size(col("sh")).as("n_sh"),
        explode(col("sh")).as("tok"))
      val dfreq = tokens.groupBy("tok").agg(count(lit(1)).as("df"))
      val wRare = Window.partitionBy("doc_id").orderBy(col("df").asc, col("tok").asc)
      val prefixLen = (col("n_sh") - ceil(col("n_sh") * 0.5) + 1).cast("int")
      val prefixes = tokens.join(dfreq, "tok")
        .withColumn("__r", row_number().over(wRare))
        .filter(col("__r") <= prefixLen)
        .select("doc_id", "tok")
      val aT = prefixes.select(col("doc_id").as("a_id"), col("tok"))
      val bT = prefixes.select(col("doc_id").as("b_id"), col("tok"))
      val cand = aT.join(bT, Seq("tok")).filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id").distinct()
      time("jj: prefixes only")(noop(prefixes))
      time("jj: candidates only")(noop(cand))
      time("jj: verify only")(noop(NearDup.jaccardVerify(cand, sigs2)))
      println("jj candidate pairs: " + cand.count())
    }
    spark.stop()
  }
}
