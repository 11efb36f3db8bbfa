package graft.sources

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextSourcesSpec extends SparkSpec {
  import spark.implicits._

  private def roundtripDirs(tag: String): (String, String) =
    (s"/tmp/graft_test_${tag}_jsonl", s"/tmp/graft_test_${tag}_csv")

  private def cleanup(paths: String*): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    paths.foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p), true))
  }

  test("JSONL and CSV round-trip longs, doubles and strings bit-exactly") {
    val src = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    val (jdir, cdir) = roundtripDirs("rt")
    cleanup(jdir, cdir)
    src.write.json(jdir)
    src.write.option("header", "true").csv(cdir)
    val key = Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    val orig = src.orderBy(key.map(col): _*).collect().toSeq
    val j = TextSources.readJsonLines(spark, jdir, src.schema)
      .orderBy(key.map(col): _*).collect().toSeq
    val c = TextSources.readCsv(spark, cdir, src.schema)
      .orderBy(key.map(col): _*).collect().toSeq
    assert(j == orig)
    assert(c == orig)
  }

  test("FAILFAST surfaces a malformed line instead of nulling it away") {
    val dir = "/tmp/graft_test_badjson"
    cleanup(dir)
    Seq("""{"a": 1}""", """{"a": NOT_JSON""").toDF("value")
      .coalesce(1).write.text(dir)
    val schema = org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.LongType)))
    val ex = intercept[SparkException] {
      TextSources.readJsonLines(spark, dir, schema).collect()
    }
    assert(ex.getMessage.contains("MALFORMED_RECORD") ||
      ex.getCause != null, ex.getMessage.take(300))
  }

  test("column pruning reaches the text scans (2-field ReadSchema on a 4-field feed)") {
    val src = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    val (jdir, cdir) = roundtripDirs("prune")
    cleanup(jdir, cdir)
    src.write.json(jdir)
    src.write.option("header", "true").csv(cdir)
    for (df <- Seq(
        TextSources.readJsonLines(spark, jdir, src.schema),
        TextSources.readCsv(spark, cdir, src.schema))) {
      val plan = df.select("l_returnflag", "l_quantity")
        .queryExecution.executedPlan.toString
      val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
      assert(readSchema.contains("l_returnflag") && readSchema.contains("l_quantity"),
        readSchema)
      assert(!readSchema.contains("l_orderkey"), readSchema)
    }
  }
}
