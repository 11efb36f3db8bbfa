package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class RelationalSketchSpec extends SparkSpec {

  test("HLL distinct counts are within 2% of exact; approx median within one unit") {
    val approx = Relational.approxSketches(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("parts"),
           percentile(col("l_quantity"), lit(0.5)).as("median"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    exact.foreach { case (flag, (parts, median)) =>
      val (aParts, aMedian) = approx(flag)
      assert(math.abs(aParts - parts).toDouble / parts < 0.02,
        s"$flag: HLL $aParts vs exact $parts")
      assert(math.abs(aMedian - median) <= 1.0,
        s"$flag: approx median $aMedian vs exact $median")
    }
  }
}
