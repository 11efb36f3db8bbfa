package graft

import org.apache.spark.sql.SparkSession
import graft.operators.NearDup
import graft.sources.Tables

/** Dev tool: time + count `NearDup.editDistancePairs` per SF dir — the
  * constant-duplication-rate scale probe (pair output should stay
  * ~rate-proportional when the corpus is scaled with `ScaleUp` mode=perturb,
  * so the measured exponent reflects the PLAN, not fixture construction). */
object ProbeEditDist {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id) s").write.format("noop").mode("overwrite").save()
    args.foreach { dir =>
      val docs = Tables.documents(spark, dir)
      // candidate/output split (round-10 SCALE.md separation): candidates =
      // the verify DP's input (post length-bucketed blocking + Hamming gate);
      // output = ratio-accepted true pairs. The gap is the collision share.
      val cand = NearDup.lenBucketedSimhashPairs(docs, 8, 30).count()
      val t0 = System.nanoTime()
      val n = NearDup.editDistancePairs(docs).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$dir: candidates $cand -> editDistancePairs $n rows in $sec%.1f s")
    }
    spark.stop()
  }
}
