package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import org.scalatest.funsuite.AnyFunSuite

/** Bucketing demo: pre-bucketing both sides of a recurring fact-fact join on
  * the join key removes the per-query shuffle entirely — the canonical
  * amortize-the-exchange technique for 100 TB pipelines where lineitem and
  * orders are joined daily. Uses its own session because bucketed tables need
  * a (derby-backed, /tmp) warehouse. */
class BucketedJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val wh = Files.createTempDirectory("graft_wh").toString
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", wh)
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:memory:graft_metastore;create=true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("bucketed tables join with zero exchanges; unbucketed join shuffles both sides") {
    val sf = "/root/testdata/sf0.001"
    // catalog is per-JVM but table locations persist on disk: clear both
    Seq("li_b", "o_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + s"/$t")
      org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
        .delete(loc, true)
    }
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice")

    val unbucketedPlan = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(unbucketedPlan).size >= 2,
      "plain fact-fact join shuffles both sides")

    li.write.mode("overwrite").bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_b")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_b")

    val lb = spark.table("li_b")
    val ob = spark.table("o_b")
    val joined = lb.join(ob, lb("l_orderkey") === ob("o_orderkey"))
    val bucketedPlan = joined.queryExecution.executedPlan.toString
    assert(!bucketedPlan.contains("Exchange"),
      s"bucketed join must not shuffle:\n${bucketedPlan.take(1500)}")

    // same results either way
    val a = li.join(o, li("l_orderkey") === o("o_orderkey")).count()
    assert(joined.count() == a)
  }

  test("colocatedJoinAgg: both scans bucketed, SMJ without a join-side exchange, values equal the plain-parquet join") {
    val sf = "/root/testdata/sf0.001"
    val df = graft.sources.BucketedTables.colocatedJoinAgg(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p.take(2000))
    assert("Bucketed: true".r.findAllIn(p).size == 2, p.take(3000))
    // exchanges exist only ABOVE the join (countDistinct rollup + final
    // sort); the SMJ children read the co-bucketed layout directly — no
    // hash exchange may appear below the join in the plan text
    val joinIdx = p.indexOf("SortMergeJoin")
    assert(!p.substring(joinIdx).contains("Exchange hashpartitioning"),
      p.substring(joinIdx).take(2000))

    // value parity with the straightforward parquet join
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
    val plain = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        countDistinct(col("o_orderkey")).as("n_orders"),
        count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(28,10)")).cast("decimal(28,4)").cast("double")
          .as("revenue"))
      .orderBy("o_orderpriority")
    assert(df.collect().toSeq == plain.collect().toSeq)
  }
}
