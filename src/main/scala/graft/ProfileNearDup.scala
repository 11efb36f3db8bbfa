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
    // internal split of jaccardJoin — the REAL stages (jaccardStages), each
    // incremental on the previous via the checkpointed signature table
    locally {
      val (sigs2, prefixes, cand) = NearDup.jaccardStages(docs, 0.5)
      time("jj: signatures (ckpt)")(noop(sigs2))
      time("jj: prefixes")(noop(prefixes))
      time("jj: candidates")(noop(cand))
      time("jj: verify")(noop(NearDup.jaccardVerify(cand, sigs2)))
      println("jj candidate pairs (post length+positional filter): " + cand.count())
    }
    spark.stop()
  }
}
