package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-11 probe: is the fused narrow IVF assignment paying the decimal
  * distance kernel more than once per row (array_position(ds, array_min(ds))
  * duplicating a non-CSE'd subtree), and does staging ds through a two-step
  * select (the TokenScore discipline) fix it? Times the legacy windowed
  * argmin, the fused single-select form, and the staged form, same JVM. */
object ProbeIvfR11 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.sources.Tables.embeddings(spark, dir)
    def time(tag: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[probe] $tag%-10s iter $i: ${(System.nanoTime() - t0) / 1e9}%7.2f s (n=$n)")
      }
    }
    time("legacy") {
      graft.operators.IvfIndex.assignmentsLegacy(emb, 8, 1)
        .groupBy("list").count().collect().map(_.getLong(1)).sum
    }
    time("fused") {
      graft.operators.IvfIndex.assignments(emb, 8, 1)
        .groupBy("list").count().collect().map(_.getLong(1)).sum
    }
    spark.stop()
  }
}
