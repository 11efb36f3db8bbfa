package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RowOpsSpec extends SparkSpec {
  import spark.implicits._

  test("null-literal drop: 'null'/'NULL'/'Null' string forms become SQL NULL (HanaDBRowToTableRowFn.java:33-35)") {
    val df = Seq(("a", "null"), ("b", "NULL"), ("c", "Null"),
                 ("d", "nullx"), ("e", null)).toDF("k", "v")
    val out = RowOps.dropNullLiterals(df, Seq("v")).orderBy("k")
      .collect().map(r => Option(r.getString(1)))
    assert(out.toSeq == Seq(None, None, None, Some("nullx"), None))
  }

  test("SQL NULL stays NULL (field-omission semantics, HanaDBRowToTableRowFn.java:31-32)") {
    val df = Seq((1, null: String)).toDF("k", "v")
    assert(RowOps.stringifyAll(df).first().isNullAt(1))
  }

  test("stringifyAll makes every column string-typed with names intact") {
    val df = Seq((1L, 2.5, true)).toDF("a", "b", "c")
    val out = RowOps.stringifyAll(df)
    assert(out.schema.fields.forall(_.dataType.typeName == "string"))
    assert(out.columns.toSeq == Seq("a", "b", "c"))
    val r = out.first()
    assert(r.getString(0) == "1" && r.getString(2) == "true")
  }

  test("half-open range: lo inclusive, hi exclusive (HanaToBQ.java:58)") {
    val df = Seq(9L, 10L, 15L, 19L, 20L).toDF("ts")
    val got = RowOps.rangeHalfOpen(df, "ts", lit(10L), lit(20L))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(10L, 15L, 19L))
  }

  test("pred_gt is strict (HanaToBQ.java:57)") {
    val df = Seq(9L, 10L, 11L).toDF("ts")
    val got = RowOps.greaterThan(df, "ts", lit(10L)).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(11L))
  }
}
