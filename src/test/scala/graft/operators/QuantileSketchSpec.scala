package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private def pop(n: Int) =
    (1 to n).map(i => (i.toLong, i.toDouble)).toDF("id", "v")

  test("quantileSketch with k >= n reproduces exact nearest-rank quantiles") {
    val df = pop(1000)
    val r = Merge.quantileSketch(df, k = 2000, id = "id", valueCol = "v")
      .collect().map(row => row.getAs[Double]("q") -> row).toMap
    // sample == population, so est is the exact nearest-rank quantile
    assert(r(0.5).getAs[Double]("est") == 500.0)
    assert(r(0.25).getAs[Double]("est") == 250.0)
    assert(r(0.9).getAs[Double]("est") == 900.0)
    assert(r(0.5).getAs[Long]("n_sample") == 1000L)
    assert(r(0.5).getAs[Long]("n_le") == 500L)
    assert(r(0.5).getAs[Double]("rank_err") == 0.0)
  }

  test("rank-space error is small at k=256 over a 5000-row population") {
    val df = pop(5000)
    val errs = Merge.quantileSketch(df, k = 256, id = "id", valueCol = "v")
      .collect().map(_.getAs[Double]("rank_err"))
    // O(1/sqrt(k)) ~ 0.0625; allow 3x slack for the deterministic draw
    assert(errs.forall(_ < 0.19), s"rank errors too large: ${errs.toSeq}")
  }

  test("sample state merges: bottom-k of shard-sample union == full sample") {
    val df = pop(3000)
    val k = 128
    val full = Merge.quantileSample(df, k, "id", "v")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val shards = Seq(
      df.filter(col("id") % 3 === 0), df.filter(col("id") % 3 === 1),
      df.filter(col("id") % 3 === 2))
    val states = shards.map(Merge.quantileSample(_, k, "id", "v"))
    val merged = Merge.quantileSample(
      states.reduce(_ unionByName _), k, "sid", "sv")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(merged == full)
  }

  test("partition invariance: 1-partition and 13-partition runs agree") {
    val df = pop(2000)
    def run(parts: Int) =
      Merge.quantileSketch(df.repartition(parts), k = 64, id = "id",
        valueCol = "v").collect().map(_.toSeq).toSeq
    assert(run(1) == run(13))
  }

  test("grouped sketch: exact per-group nearest-rank when k >= group size") {
    val df = (1 to 900).map(i => (i.toLong, s"g${i % 3}", i.toDouble))
      .toDF("id", "g", "v")
    val r = Merge.quantileSketchByGroup(df, k = 500, group = "g", id = "id",
      valueCol = "v", qs = Seq(0.5)).collect()
    r.foreach { row =>
      assert(row.getAs[Long]("n_sample") == 300L)
      assert(row.getAs[Double]("rank_err") == 0.0)
      // group g0 = {3,6,...,900}: median = 150th value = 450
      if (row.getAs[String]("g") == "g0")
        assert(row.getAs[Double]("est") == 450.0)
    }
  }

  test("grouped sketch: partition invariance") {
    val df = (1 to 2000).map(i => (i.toLong, s"g${i % 7}", (i * 13 % 101).toDouble))
      .toDF("id", "g", "v")
    def run(p: Int) =
      Merge.quantileSketchByGroup(df.repartition(p), k = 32, group = "g",
        id = "id", valueCol = "v").collect().map(_.toSeq).toSeq
    assert(run(1) == run(13))
  }

  test("estimate audit: n_le counts duplicates at the estimate value") {
    // heavy ties: value = id / 10 (integer div) -> 10 rows per value
    val df = (1 to 200).map(i => (i.toLong, (i / 10).toDouble)).toDF("id", "v")
    val r = Merge.quantileSketch(df, k = 500, id = "id", valueCol = "v",
      qs = Seq(0.5)).first()
    val est = r.getAs[Double]("est")
    val nLe = df.filter(col("v") <= est).count()
    assert(r.getAs[Long]("n_le") == nLe)
  }
}
