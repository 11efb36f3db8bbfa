package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SchemaDriftSpec extends SparkSpec {
  import spark.implicits._

  private val target = StructType(Seq(
    StructField("k", LongType), StructField("v", DoubleType),
    StructField("s", StringType)))

  test("alignToSchema widens, null-fills and drops") {
    val df = Seq((1, 2.5f, "x")).toDF("k", "v", "extra")
      .select(col("k").cast("int").as("k"), col("v"), col("extra"))
    val out = SchemaDrift.alignToSchema(df, target)
    assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      target.fields.map(f => (f.name, f.dataType)).toSeq)
    val r = out.first()
    assert(r.getLong(0) == 1L && r.getDouble(1) == 2.5 && r.isNullAt(2))
  }

  test("alignToSchema is fail-closed on narrowing and cross-family changes") {
    val narrow = Seq((1L, "x")).toDF("k", "s")
      .select(col("k"), col("s"))
    val tgtNarrow = StructType(Seq(StructField("k", IntegerType),
      StructField("s", StringType)))
    intercept[IllegalArgumentException] {
      SchemaDrift.alignToSchema(narrow, tgtNarrow)
    }
    val crossFam = StructType(Seq(StructField("k", StringType),
      StructField("s", StringType)))
    intercept[IllegalArgumentException] {
      SchemaDrift.alignToSchema(narrow, crossFam)
    }
  }

  test("readEvolved unions drifted batches; pushdown reaches each scan") {
    val out = "/tmp/graft_schema_drift_spec"
    Seq((1, 1.5f), (2, 2.5f)).toDF("k", "v")
      .select(col("k").cast("int").as("k"), col("v"))
      .write.mode("overwrite").parquet(s"$out/b1")
    Seq((3L, 3.5, "c"), (4L, 4.5, "d")).toDF("k", "v", "s")
      .write.mode("overwrite").parquet(s"$out/b2")
    val ev = SchemaDrift.readEvolved(spark, Seq(s"$out/b1", s"$out/b2"), target)
    assert(ev.count() == 4L)
    assert(ev.filter(col("s").isNull).count() == 2L)
    // filter on the unioned relation must push into BOTH parquet scans
    val p = ev.filter(col("k") > 2L).queryExecution.executedPlan.toString
    assert("PushedFilters: \\[IsNotNull\\(k\\)".r.findAllIn(p).size == 2 ||
      "GreaterThan\\(k".r.findAllIn(p).size >= 1, p.take(3000))
  }

  test("driftReport names missing/extra/widened columns per batch") {
    val out = "/tmp/graft_schema_drift_spec2"
    Seq((1, 1.5f)).toDF("k", "v")
      .select(col("k").cast("int").as("k"), col("v"))
      .write.mode("overwrite").parquet(s"$out/b1")
    Seq((3L, 3.5, "c", "t")).toDF("k", "v", "s", "extra")
      .write.mode("overwrite").parquet(s"$out/b2")
    val r = SchemaDrift.driftReport(spark, Seq(s"$out/b1", s"$out/b2"), target)
      .collect().map(row => row.getString(0) ->
        (row.getString(1), row.getString(2), row.getString(3))).toMap
    assert(r("b1") == (("s", "", "k,v")))
    assert(r("b2") == (("", "extra", "")))
  }
}
