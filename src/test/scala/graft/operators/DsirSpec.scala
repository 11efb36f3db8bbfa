package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class DsirSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf)
  private def target = col("source").isin("src0", "src1")

  test("bucket weights: totals are consistent and target mass shifts weights") {
    val w = Dsir.bucketWeights(docs, target).collect()
    assert(w.length <= Dsir.NBuckets)
    // r >= t everywhere (target is a subset of raw)
    assert(w.forall(r => r.getLong(1) >= r.getLong(2)))
    // weights positive; buckets overrepresented in the target score > 1
    assert(w.forall(_.getDouble(3) > 0.0))
    val rr = w.map(_.getLong(1)).sum.toDouble + Dsir.NBuckets
    val tt = w.map(_.getLong(2)).sum.toDouble + Dsir.NBuckets
    val overRep =
      w.filter(r => (r.getLong(2) + 1) / tt > (r.getLong(1) + 1) / rr)
    assert(overRep.nonEmpty && overRep.forall(_.getDouble(3) > 1.0))
    // and the spread is real: both >1 and <1 weights exist
    assert(w.exists(_.getDouble(3) < 1.0))
  }

  test("select keeps exactly k docs, deterministically, ordered by doc_id") {
    val a = Dsir.select(docs, target, k = 50).collect()
    val b = Dsir.select(docs, target, k = 50).collect()
    assert(a.length == 50)
    assert(a.map(_.getLong(0)).toSeq == a.map(_.getLong(0)).sorted.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("selection favors target-stratum-shaped docs over the corpus rate") {
    // target docs should be overrepresented among their own top-k vs their
    // share of the corpus (the whole point of importance resampling)
    val withSrc = Dsir.select(docs, target, k = 50)
      .join(docs.select("doc_id", "source"), "doc_id")
    val inTarget = withSrc.filter(target).count().toDouble / 50.0
    val baseRate =
      docs.filter(target).count().toDouble / docs.count().toDouble
    assert(inTarget >= baseRate,
      s"target share in selection $inTarget < corpus rate $baseRate")
  }

  test("scoring plan is a zero-exchange narrow map up to the TakeOrdered") {
    val p = Dsir.select(docs, target, k = 50)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p.take(2000))
    // TakeOrderedAndProject handles the top-k; the only exchange allowed is
    // the final presentation sort's range partitioning
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert("Exchange".r.findAllIn(p).size <= 1, p.take(2000))
  }
}
