package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** Diagnostic (not an assertion suite): print executed plans for the ops
  * whose shuffle structure matters. Run explicitly via
  * `testOnly graft.operators.ExplainCheck`. */
class ExplainCheck extends SparkSpec {
  test("boundariesDistributed plan: exchange reuse across counts + main path") {
    val li = Tables.lineitem(spark, sf)
      .withColumn("ts_epoch", col("l_shipdate").cast("timestamp").cast("long"))
    val b = Chunking.boundariesDistributed(li, "ts_epoch",
      Seq("l_orderkey", "l_linenumber"), 100L, 788918400L)
    b.collect() // execute so AQE finalizes
    val plan = b.queryExecution.executedPlan.toString
    println("== boundariesDistributed ==")
    println(plan.take(4000))
    println("ReusedExchange present: " + plan.contains("ReusedExchange"))
    println("Scan count: " + "Scan parquet".r.findAllIn(plan).size)
  }
}
