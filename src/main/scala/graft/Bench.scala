package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session warmup so the first timed query doesn't absorb codegen/classload
    // and parquet-reader init costs (~3-5s) that belong to the JVM, not the plan
    spark.range(1000).selectExpr("sum(id) s").write.format("noop").mode("overwrite").save()
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_name").count().write.format("noop").mode("overwrite").save()
    // noop sink: forces full materialization of every column (count() would
    // let Spark prune all columns and skip the actual work).
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-24s $dt%8.2f s")
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fs = failed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fs,"sf":"$sfDir"}"""
    // stdout for the driver's line parser (run/outputStrategy keeps it
    // prefix-free) AND a clean file as the unambiguous channel.
    println(line)
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_METRIC.json"))
    java.nio.file.Files.write(out,
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    // a failed query must not masquerade as a clean bench run
    if (failed.nonEmpty) sys.exit(1)
  }
}
