package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class PartitionedSinkSpec extends SparkSpec {

  test("date-partitioned sink: layout prunes partitions at plan time") {
    val out = Files.createTempDirectory("graft_part_sink").toString + "/events"
    val ev = Tables.events(spark, sf)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    AppendSink.appendPartitioned(ev, out, Seq("day"))

    val back = AppendSink.readBack(spark, out)
    assert(back.count() == ev.count())

    val days = ev.select("day").distinct().as[String](spark.implicits.newStringEncoder).collect().sorted
    val oneDay = back.filter(col("day") === days.head)
    val plan = oneDay.queryExecution.executedPlan.toString
    // partition predicate must land in PartitionFilters (directory pruning),
    // not PushedFilters (row filtering)
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*PartitionFilters", "").contains("day"), plan.take(1200))
    assert(oneDay.count() == ev.filter(col("day") === days.head).count())
  }

  test("append mode accumulates (create-if-needed then append, HanaToBQ.java:258-259 semantics)") {
    val out = Files.createTempDirectory("graft_append").toString + "/t"
    val df = Tables.region(spark, sf)
    AppendSink.appendParquet(df, out)   // create-if-needed
    AppendSink.appendParquet(df, out)   // append
    assert(AppendSink.readBack(spark, out).count() == 2 * df.count())
  }
}
