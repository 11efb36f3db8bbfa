package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OrcSourceSpec extends SparkSpec {

  test("ORC roundtrip preserves every row and type (decimal, NTZ timestamp, string)") {
    val src = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
        "l_extendedprice", "l_shipdate")
    val path = "/tmp/graft_orc_spec"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(path), true)
    OrcSource.writeOrc(src, path)
    val back = OrcSource.readOrc(spark, path, src.schema)
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("predicate pushdown and column pruning reach the ORC scan") {
    val src = Tables.lineitem(spark, sf).select("l_orderkey", "l_returnflag",
      "l_quantity")
    val path = "/tmp/graft_orc_spec_prune"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(path), true)
    OrcSource.writeOrc(src, path)
    val q = OrcSource.readOrc(spark, path, src.schema)
      .filter(col("l_quantity") > 40)
      .select("l_returnflag")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,"), p.take(2000))
    // pruned read schema: only the predicate + projected columns
    assert(!p.contains("l_orderkey"), p.take(2000))
  }
}
