package graft

import org.apache.spark.sql.SparkSession
import graft.operators.NearDup
import graft.sources.Tables

/** Dev tool: print [[NearDup.autoTuneBanding]]'s pick and the resulting
  * pair counts per SF dir given on the command line. */
object ProbeAutoTune {
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
      val t0 = System.nanoTime()
      val pick = NearDup.autoTuneBanding(docs, 0.5)
      val tuneSec = (System.nanoTime() - t0) / 1e9
      val pairs = NearDup.minhashPairs(docs, 0.5, 3, pick.numHashes, pick.numBands).count()
      val t2 = System.nanoTime()
      val defPairs = NearDup.minhashPairs(docs, 0.5).count()
      val defSec = (System.nanoTime() - t2) / 1e9
      println(f"$dir: pick=bands ${pick.numBands} x rows ${pick.rowsPerBand} " +
        f"(hashes ${pick.numHashes}) tune $tuneSec%.1fs pairs(auto)=$pairs " +
        f"pairs(default 4x4)=$defPairs ($defSec%.1fs)")
    }
    spark.stop()
  }
}
