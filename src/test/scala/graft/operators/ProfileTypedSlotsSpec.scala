package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Focused pins for the round-14 `buildProfile` rewrite (one typed-slot
  * exploded aggregate instead of two passes): the edge cases the slot
  * design must carry — decimal columns (grouped by canonical render, a
  * fixed-width slot would overflow; min/max via the monotone double
  * cast), timestamps with sub-second precision (the (epoch-second,
  * micro-remainder) slot pair must stay injective while min_str renders
  * epoch SECONDS), all-null columns, and the empty-input report grain. */
class ProfileTypedSlotsSpec extends SparkSpec {

  test("decimal columns: exact distincts at precision 38 and min/max " +
    "through the monotone double cast") {
    import spark.implicits._
    val df = Seq("99999999999999999999999999999999999998",
        "99999999999999999999999999999999999997",
        "99999999999999999999999999999999999998", "1")
      .toDF("s")
      .select(col("s").cast(DecimalType(38, 0)).as("d"))
    val r = Profile.tableProfile(df).collect()(0)
    // a decimal(38,18) grouping slot would overflow all three wide values
    // to null (n_distinct 1, n_null 3); the canonical-render slot keeps
    // them distinct and non-null
    assert(r.getAs[Long]("n_null") == 0L)
    assert(r.getAs[Long]("n_distinct") == 3L)
    assert(r.getAs[Double]("min_num") == 1.0)
    assert(r.getAs[Double]("max_num") == 1.0e38)
  }

  test("timestamps: micro-precision values stay distinct; min/max render " +
    "as epoch seconds") {
    import spark.implicits._
    val df = Seq(
      Timestamp.valueOf("2021-01-01 00:00:00.000001"),
      Timestamp.valueOf("2021-01-01 00:00:00.000002"),
      Timestamp.valueOf("2021-01-01 00:00:00.000001"),
      Timestamp.valueOf("2021-01-02 00:00:00"))
      .toDF("ts")
    val r = Profile.tableProfile(df).collect()(0)
    // same epoch second, different micros -> distinct values
    assert(r.getAs[Long]("n_distinct") == 3L)
    // min/max are the pass-1 contract: epoch-SECOND strings
    assert(r.getAs[String]("min_str") == "1609459200")
    assert(r.getAs[String]("max_str") == "1609545600")
    assert(r.isNullAt(r.fieldIndex("min_num")))
  }

  test("all-null column and empty input keep the report grain") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "dead")
    val got = Profile.tableProfile(df).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    val dead = got("dead")
    assert(dead.getAs[Long]("n_rows") == 2L)
    assert(dead.getAs[Long]("n_null") == 2L)
    assert(dead.getAs[Long]("n_distinct") == 0L)
    assert(dead.isNullAt(dead.fieldIndex("min_str")))

    val empty = Profile.tableProfile(
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        StructType(Seq(StructField("a", LongType), StructField("b", StringType)))))
      .collect()
    assert(empty.length == 2) // one row per column, even with zero input
    assert(empty.forall(r => r.getAs[Long]("n_rows") == 0L &&
      r.getAs[Long]("n_distinct") == 0L))
  }
}
