package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Per-query plan snapshots for the optimization-round evidence trail:
  * `runMain graft.PlanSnap <outDir> <suffix> <query> [query...]` writes
  * `<outDir>/<query>_<suffix>.txt` with the `explain("formatted")` output
  * (same mode as [[PlanDump]]) — run once on the pre-change tree with
  * suffix `before` and once after, so plan claims are diffable without
  * running Spark. */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanSnap <outDir> <suffix> <query>...")
    val (outDir, suffix, names) = (args(0), args(1), args.drop(2).toSeq)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.registerAll(spark)
    // fixture dir from the standard env hook (round-13 ADVICE: the
    // hardcoded sf0.001 silently pinned snapshots to one scale)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val body = s"## $name\n\n```\n" + df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode) + "```\n"
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), body)
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
