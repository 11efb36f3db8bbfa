package graft.operators

import graft.SparkSpec
import graft.sources.Tables

class CentroidFilterSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sf)

  test("exactly bottomK flagged per label, cosine bounded") {
    val out = Similarity.centroidOutliers(emb, bottomK = 5).collect()
    assert(out.forall(r => r.getDouble(2) >= -1.0 - 1e-12 &&
      r.getDouble(2) <= 1.0 + 1e-12))
    val byLabel = out.groupBy(_.getInt(1))
    byLabel.foreach { case (l, rows) =>
      val flagged = rows.filter(_.getBoolean(4))
      assert(flagged.length == math.min(5, rows.length), s"label $l")
      // flagged rows are exactly the lowest-cosine rows of the label
      val worst = rows.sortBy(r => (r.getDouble(2), r.getLong(0)))
        .take(flagged.length).map(_.getLong(0)).toSet
      assert(flagged.map(_.getLong(0)).toSet == worst, s"label $l")
    }
  }

  test("scoring never joins; only the rank window and sort exchange") {
    val p = Similarity.centroidOutliers(emb).queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p.take(2000))
    // one hash exchange (label window) + one range (presentation sort)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(2000))
  }

  test("inliers score higher than outliers on average (sanity of direction)") {
    val out = Similarity.centroidOutliers(emb, bottomK = 5).collect()
    val (o, i) = out.partition(_.getBoolean(4))
    val avg = (rs: Array[org.apache.spark.sql.Row]) =>
      rs.map(_.getDouble(2)).sum / rs.length
    assert(avg(i) > avg(o))
  }
}
