package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardByTokensSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) =
    (1 to n).map { i =>
      val len = (i * 61) % 900 + 1
      (i.toLong, Seq.fill(len)("w").mkString(" "))
    }.toDF("doc_id", "text")

  test("all docs assigned; doc and token mass conserved") {
    val docs = corpus(400)
    val r = Packing.shardByTokens(docs, nShards = 8).collect()
    assert(r.map(_.getAs[Long]("n_docs")).sum == 400L)
    val totalTokens = docs
      .select(sum(size(split(trim(col("text")), "\\s+")).cast("long")))
      .first().getLong(0)
    assert(r.map(_.getAs[Long]("sum_tokens")).sum == totalTokens)
    assert(math.abs(r.map(_.getAs[Double]("share_frac")).sum - 1.0) < 1e-9)
  }

  test("LPT deal balances: heaviest shard within one max-doc of the lightest") {
    val r = Packing.shardByTokens(corpus(500), nShards = 8).collect()
    val tokens = r.map(_.getAs[Long]("sum_tokens"))
    // round-robin over descending sizes: spread bounded by the largest doc
    assert(tokens.max - tokens.min <= 900L,
      s"imbalance ${tokens.max - tokens.min}")
  }

  test("matches the naive global-rank deal and is partition invariant") {
    val docs = corpus(300)
    def run(d: org.apache.spark.sql.DataFrame) =
      Packing.shardByTokens(d, nShards = 5, strideTokens = 17)
        .collect().map(_.toSeq).toSeq
    assert(run(docs.repartition(1)) == run(docs.repartition(13)))
    // naive: one global window
    val nTok = size(split(trim(col("text")), "\\s+")).cast("long")
    val naive = docs.select(col("doc_id"), nTok.as("n_tokens"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n_tokens").desc, col("doc_id").asc)).cast("long") - 1L)
      .withColumn("shard", pmod(col("rk"), lit(5L)))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"))
      .orderBy("shard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val got = run(docs).map(s => (s(0), s(1), s(2)))
    assert(got == naive)
  }
}
