package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class RelationalSketchSpec extends SparkSpec {

  test("sketch verdict booleans are all true and exact columns match a recompute") {
    val rows = Relational.approxSketches(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(4), s"${r.getString(0)}: HLL outside 5% of exact")
      assert(r.getBoolean(5), s"${r.getString(0)}: approx median > 1 unit off exact")
    }
    val exact = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("parts"),
           percentile(col("l_quantity"), lit(0.5)).as("median"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    rows.foreach { r =>
      val (parts, median) = exact(r.getString(0))
      assert(r.getLong(2) == parts, s"${r.getString(0)}: n_parts_exact drifted")
      assert(r.getDouble(3) == median, s"${r.getString(0)}: median_exact drifted")
    }
  }
}
