package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave places bit j of dim i at position j*n+i") {
    // x=0b11 (bits at z-positions 0,2), y=0b01 (bit at z-position 1) -> 0b111
    val r = Seq((3L, 1L)).toDF("x", "y")
      .select(ZOrder.interleave(Seq(col("x"), col("y"))).as("z"))
      .as[Long].head()
    assert(r == 7L)
    // three dims: x=1 -> pos 0, y=1 -> pos 1, w=1 -> pos 2
    val r3 = Seq((1L, 1L, 1L)).toDF("x", "y", "w")
      .select(ZOrder.interleave(Seq(col("x"), col("y"), col("w"))).as("z"))
      .as[Long].head()
    assert(r3 == 7L)
  }

  test("withZKey normalizes min->0 and max->2^bits-1; constant column -> 0") {
    val df = Seq((10L, 5L), (20L, 5L), (30L, 5L)).toDF("a", "b")
    val got = ZOrder.withZKey(df, Seq("a", "b")).select("a", "zkey")
      .as[(Long, Long)].collect().toMap
    // b is constant -> contributes nothing; a: 10 -> 0, 30 -> 65535
    // interleaved alone at even positions: spread(0)=0, spread(65535)=0x55555555
    assert(got(10L) == 0L)
    assert(got(30L) == 0x55555555L) // 65535's 16 bits spread to even positions
    assert(got(20L) > 0L && got(20L) < got(30L))
  }

  test("clusteringReport buckets bound every interleaved column") {
    val li = graft.sources.Tables.lineitem(spark, sf)
    val rep = ZOrder.clusteringReport(li, Seq("l_partkey", "l_suppkey"), 32)
      .collect()
    assert(rep.length > 8, "expect most of the 32 zkey buckets populated")
    val gp = rep.map(r => r.getAs[Long]("l_partkey_max")).max -
      rep.map(r => r.getAs[Long]("l_partkey_min")).min
    val gs = rep.map(r => r.getAs[Long]("l_suppkey_max")).max -
      rep.map(r => r.getAs[Long]("l_suppkey_min")).min
    // the locality claim: per-bucket ranges are materially tighter than the
    // global range on BOTH dimensions (a single-column sort fails this on
    // the other column; random layout fails on both)
    rep.foreach { r =>
      val bp = r.getAs[Long]("l_partkey_max") - r.getAs[Long]("l_partkey_min")
      val bs = r.getAs[Long]("l_suppkey_max") - r.getAs[Long]("l_suppkey_min")
      assert(bp <= gp / 2 + 1, s"bucket ${r.getAs[Long]("bucket")} partkey range $bp vs global $gp")
      assert(bs <= gs / 2 + 1, s"bucket ${r.getAs[Long]("bucket")} suppkey range $bs vs global $gs")
    }
  }

  test("laid-out parquet actually prunes: filtered scan reads fewer rows than unclustered") {
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    // tiny row groups so a small fixture still spans many pruning units
    val rg = Map("parquet.block.size" -> (32 * 1024).toString)
    ZOrder.layout(li, Seq("l_partkey", "l_suppkey"), nBuckets = 8)
      .drop("zkey")
      .write.options(rg).mode("overwrite").parquet(s"$base/clustered")
    li.repartition(8, col("l_orderkey")) // layout-free baseline, same file count
      .write.options(rg).mode("overwrite").parquet(s"$base/plain")

    def scanned(path: String): Long = {
      val df = spark.read.parquet(path)
        .filter(col("l_partkey") < 50 && col("l_suppkey") < 3)
      df.collect() // execute so scan metrics populate
      val scan = df.queryExecution.executedPlan.collectLeaves().head
      scan.metrics("numOutputRows").value
    }
    // both read the same logical result...
    val a = spark.read.parquet(s"$base/clustered")
      .filter(col("l_partkey") < 50 && col("l_suppkey") < 3).count()
    val b = spark.read.parquet(s"$base/plain")
      .filter(col("l_partkey") < 50 && col("l_suppkey") < 3).count()
    assert(a == b && a > 0)
    // ...but the scan under the clustered layout emits far fewer rows:
    // row-group min/max stats line up with the filter on BOTH columns only
    // when the file order is the Z-curve
    val clustered = scanned(s"$base/clustered")
    val plain = scanned(s"$base/plain")
    assert(clustered < plain / 2,
      s"expected >2x row-group pruning from the layout: clustered=$clustered plain=$plain")
  }

  test("layout plan: one range-partition exchange, stats broadcast, sorted zkeys") {
    val li = graft.sources.Tables.lineitem(spark, sf)
    val out = ZOrder.layout(li, Seq("l_partkey", "l_suppkey"), nBuckets = 8)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"), "layout must range-partition on zkey")
    assert(!plan.contains("SortMergeJoin"), "stats join must broadcast, not SMJ")
    // zkeys are non-decreasing within each output partition
    val ok = out.select("zkey").rdd.mapPartitions { it =>
      val a = it.map(_.getLong(0)).toArray
      Iterator.single(a.sameElements(a.sorted))
    }.collect()
    assert(ok.forall(identity), "zkey must be sorted within every partition")
  }
}
