package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class RelationalSketchSpec extends SparkSpec {

  test("subqueryBattery: decorrelated joins, ANSI null trap zeroes, join-consistent flags") {
    val df = Relational.subqueryBattery(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // every per-row subquery must have become a JOIN of some flavor —
    // existence joins for IN/EXISTS, anti for NOT IN, outer for the scalars
    assert(plan.contains("ExistenceJoin"), "IN/EXISTS should decorrelate: " + plan.take(300))
    assert(plan.contains("LeftAnti"), "NOT IN null-trap should plan as anti join")
    val rows = df.collect()
    // the NULL-carrying NOT IN list admits no TRUE row (ANSI three-valued
    // logic, filter context): the trap count is zero on every row
    assert(rows.forall(_.getAs[Long]("n_null_trap") == 0L))
    // flags agree with direct join recomputes
    val li = Tables.lineitem(spark, sf)
    val bigs = li.filter(col("l_quantity") > 45)
      .select("l_orderkey").distinct()
      .collect().map(_.getLong(0)).toSet
    rows.take(200).foreach { r =>
      assert(r.getAs[Boolean]("has_big") == bigs.contains(r.getAs[Long]("o_orderkey")))
    }
    // n_items joins back: spot-check one order against a direct count
    val k = rows.head.getAs[Long]("o_orderkey")
    assert(rows.head.getAs[Long]("n_items")
      == li.filter(col("l_orderkey") === k).count())
  }

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
