package graft

import org.apache.spark.sql.SparkSession
import graft.operators.NearDup
import graft.sources.Tables

/** Dev tool (round-10 SCALE.md separation): count the UN-length-gated
  * simhash-half candidate set (`simhashPairs` at the editDistancePairs
  * Hamming bound) next to the length-bucketed one — the difference is what
  * the round-10 blocking-key gate prunes before any exchange. */
object ProbeEditDistUngated {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { dir =>
      val docs = Tables.documents(spark, dir)
      val ungated = NearDup.simhashPairs(docs, maxDist = 8).count()
      val gated = NearDup.lenBucketedSimhashPairs(docs, 8, 30).count()
      println(s"$dir: ungated $ungated gated $gated")
    }
    spark.stop()
  }
}
