package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan probe: `runMain graft.ExplainOne <query> [sfDir]` — prints
  * the executed plan of one `SparkEntry.queries` entry, for join-strategy
  * forensics without editing PlanDump's headline list. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val df = SparkEntry.queries(args(0))(spark, dir)
    println(df.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}
