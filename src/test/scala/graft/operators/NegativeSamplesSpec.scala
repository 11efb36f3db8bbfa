package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NegativeSamplesSpec extends SparkSpec {
  import spark.implicits._

  private val catalog = (1L to 400L).toDF("item")
  private val inter = (1L to 60L).flatMap(u =>
    (1L to 400L).filter(i => (u + i) % 7 == 0).map(u -> _))
    .toDF("user_id", "item")

  test("negatives are never seen interactions; exactly k per covered user") {
    val neg = Graph.negativeSamples(inter, catalog, "user_id", "item", k = 4)
    assert(neg.join(inter,
      neg("user_id") === inter("user_id") && neg("neg_item") === inter("item"))
      .count() == 0L)
    val perUser = neg.groupBy("user_id").agg(count(lit(1)).as("n"),
      max("rk").as("mx")).collect()
    perUser.foreach { r =>
      assert(r.getAs[Long]("n") <= 4L && r.getAs[Long]("mx") <= 4L)
    }
    // with max(1, 400/100) = 4 buckets (~100 items each) and sparse seen
    // sets, users get k
    assert(perUser.count(_.getAs[Long]("n") == 4L) > perUser.length / 2)
  }

  test("deterministic and partition invariant") {
    def run(p: Int) =
      Graph.negativeSamples(inter.repartition(p), catalog.repartition(p),
        "user_id", "item", k = 3)
        .orderBy("user_id", "rk").collect().map(_.toSeq).toSeq
    assert(run(1) == run(13))
  }

  test("negatives rank by the pair digest: salting the id re-draws them") {
    val a = Graph.negativeSamples(inter, catalog, "user_id", "item", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Graph.negativeSamples(
        inter.withColumn("user_id", col("user_id") + 1000000L),
        catalog, "user_id", "item", k = 3)
      .collect().map(r => (r.getLong(0) - 1000000L, r.getLong(1), r.getLong(2)))
      .toSet
    assert(a != b, "shifted user ids must re-bucket and re-rank negatives")
  }
}
