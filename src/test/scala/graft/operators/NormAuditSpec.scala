package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Semantics for the embedding-health audit: planted NaN / zero / ragged
  * vectors land in the right counters and never poison the norm stats. */
class NormAuditSpec extends SparkSpec {

  test("normAudit: planted NaN, zero and ragged vectors are isolated") {
    import spark.implicits._
    val rows = Seq(
      (1, Seq(3.0f, 4.0f)),              // sq = 25
      (1, Seq(0.0f, 0.0f)),              // zero vector
      (1, Seq(1.0f, Float.NaN)),         // non-finite: excluded from stats
      (2, Seq(2.0f)),                    // ragged dim vs the next row
      (2, Seq(1.0f, 2.0f)),
      (3, Seq(Float.PositiveInfinity, 1.0f))) // inf counts as non-finite
    val got = VectorOps.normAudit(rows.toDF("label", "embedding"),
        "embedding", "label").collect()
      .map(r => r.getAs[Int]("grp") -> r).toMap

    val g1 = got(1)
    assert(g1.getAs[Long]("n") == 3L)
    assert(g1.getAs[Long]("n_nonfinite") == 1L)
    assert(g1.getAs[Long]("n_zero") == 1L)
    assert(g1.getAs[Double]("sq_min") == 0.0)
    assert(g1.getAs[Double]("sq_max") == 25.0)
    assert(g1.getAs[Double]("sq_mean") == 12.5) // mean over FINITE rows only

    val g2 = got(2)
    assert(g2.getAs[Long]("dim_min") == 1L && g2.getAs[Long]("dim_max") == 2L)
    assert(g2.getAs[Double]("sq_mean") == (4.0 + 5.0) / 2.0)

    val g3 = got(3)
    assert(g3.getAs[Long]("n_nonfinite") == 1L)
    assert(g3.isNullAt(g3.fieldIndex("sq_min"))) // no finite row to report
    assert(g3.isNullAt(g3.fieldIndex("sq_mean")))
  }

  test("normAudit plan: one narrow map + one partial-final aggregate, no join") {
    val df = VectorOps.normAudit(
      graft.sources.Tables.embeddings(spark, sf), "embedding", "label")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p.take(2000))
    // one hash exchange for the groupBy + the presentation range sort
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(3000))
    assert(p.contains("partial"), p.take(3000))
  }
}
