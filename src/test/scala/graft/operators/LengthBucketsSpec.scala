package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class LengthBucketsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) =
    (1 to n).map { i =>
      // lengths spread across several buckets, including > maxBucket
      val len = (i * 37) % 1400 + 1
      (i.toLong, Seq.fill(len)("w").mkString(" "))
    }.toDF("doc_id", "text")

  test("bucket is the smallest power of two >= tokens, clamped") {
    val r = Packing.lengthBuckets(corpus(300)).collect()
    r.foreach { row =>
      val (t, b) = (row.getAs[Long]("n_tokens"), row.getAs[Long]("bucket"))
      assert(java.lang.Long.bitCount(b) == 1)
      assert(b >= 16 && b <= 1024)
      if (t <= 1024) assert(b >= t && (b == 16 || b / 2 < t),
        s"tokens $t got bucket $b")
      else assert(b == 1024)
    }
  }

  test("assignment equals the naive per-bucket row_number form") {
    val docs = corpus(500)
    val got = Packing.lengthBuckets(docs, subSize = 7)
      .select("doc_id", "batch_idx")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // naive: one global window per bucket
    val nTok = size(split(trim(col("text")), "\\s+")).cast("long")
    val naive = docs.select(col("doc_id"), nTok.as("n_tokens"))
      .withColumn("bucket",
        Seq(16L, 32L, 64L, 128L, 256L, 512L).reverse
          .foldLeft(lit(1024L))((acc, b) =>
            when(col("n_tokens") <= b, lit(b)).otherwise(acc)))
      .withColumn("pos",
        row_number().over(Window.partitionBy("bucket").orderBy("doc_id"))
          .cast("long") - 1L)
      .withColumn("batch_idx", expr("pos div (4096 div bucket)"))
      .select("doc_id", "batch_idx")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == naive)
  }

  test("batches fill to capacity in doc-id order; only the last is partial") {
    val r = Packing.lengthBuckets(corpus(400))
      .groupBy("bucket", "batch_idx").agg(count(lit(1)).as("n"))
      .collect()
      .groupBy(_.getAs[Long]("bucket"))
    r.foreach { case (bucket, rows) =>
      val cap = 4096L / bucket
      val byIdx = rows.sortBy(_.getAs[Long]("batch_idx"))
      byIdx.init.foreach(row => assert(row.getAs[Long]("n") == cap,
        s"bucket $bucket batch ${row.getAs[Long]("batch_idx")} not full"))
      assert(byIdx.last.getAs[Long]("n") <= cap)
    }
  }

  test("token accounting: real + trunc = tokens; padded = bucket - real") {
    Packing.lengthBuckets(corpus(200)).collect().foreach { row =>
      assert(row.getAs[Long]("real_tokens") + row.getAs[Long]("trunc_tokens")
        == row.getAs[Long]("n_tokens"))
      assert(row.getAs[Long]("padded_tokens")
        == row.getAs[Long]("bucket") - row.getAs[Long]("real_tokens"))
      if (row.getAs[Long]("n_tokens") <= 1024)
        assert(row.getAs[Long]("trunc_tokens") == 0L)
    }
  }

  test("partition invariance of the report") {
    val docs = corpus(350)
    def run(parts: Int) =
      Packing.lengthBucketReport(docs.repartition(parts))
        .collect().map(_.toSeq).toSeq
    assert(run(1) == run(13))
  }
}
