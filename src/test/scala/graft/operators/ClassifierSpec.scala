package graft.operators

import graft.SparkSpec
import graft.sources.Tables

class ClassifierSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf)

  test("map-literal form is bit-identical to the broadcast-join form") {
    val a = Classifier.score(docs).collect().toSeq
    val b = Classifier.scoreJoin(docs).collect().toSeq
    assert(a == b)
  }

  test("model weights are bounded and the relation is exactly nFeatures rows") {
    val m = Classifier.model(spark).collect()
    assert(m.length == Classifier.NFeatures)
    assert(m.forall(r => math.abs(r.getLong(1)) <= 1000L))
    // content-addressed weights must not be degenerate (all one sign/value)
    assert(m.map(_.getLong(1)).distinct.length > 100)
  }

  test("map-literal plan has no join and only the final sort's exchange") {
    val p = Classifier.score(docs).queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p.take(2000))
    assert("Exchange".r.findAllIn(p).size == 1, p.take(2000))
    assert(p.contains("rangepartitioning"), p.take(2000))
  }

  test("join form broadcasts the model — never a sort-merge join") {
    val p = Classifier.scoreJoin(docs).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }
}
